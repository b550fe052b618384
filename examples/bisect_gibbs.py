"""Bisect where gibbs_w time goes at benchmark scale.

Times gibbs_w variants with pieces ablated (same shapes, wrong math):
full, no parent-message computation/routing, no w scatter-writes, and the
solve-only core.  Uses the dependency-chained loop harness (the axon relay
executes lazily; see microbench_ops).
Usage: python examples/bisect_gibbs.py [n_per_q] [cell_size]
"""

import sys
import time

import numpy as np


def _timed(fn, args, iters=5):
    import jax
    import jax.numpy as jnp

    def make_loop(k):
        @jax.jit
        def loop(a):
            def body(i, carry):
                w0, acc = carry
                r = fn(w0, *a[1:])
                s = jnp.sum(r).astype(jnp.float32)
                return (w0 + s * jnp.float32(1e-37), acc + s)

            return jax.lax.fori_loop(0, k, body, (a[0], jnp.float32(0)))[1]

        return loop

    lo, hi = make_loop(1), make_loop(1 + iters)
    float(lo(args)); float(hi(args))
    t0 = time.perf_counter()
    float(lo(args))
    t1 = time.perf_counter()
    float(hi(args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1e3


def main(n_per_q=50000, cell_size=25):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic, gibbs_w
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.ops.linalg import chol_inv_masked, chol_masked, tri_solve
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    y, y_full, miss, X, coords, mv = make_multivariate(n_per_q, 2)
    order = np.lexsort((np.arange(len(y)), coords[:, 1], coords[:, 0]))
    y, X, coords, mv = y[order], X[order], coords[order], mv[order]
    na = np.isfinite(y)
    axis = int(round(cell_size ** 0.5))
    tree = make_tree(coords, na, mv - 1, axis_cell_size=axis, K=2,
                     rng=np.random.default_rng(0))
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 2)
    ms = ModelStatic(sched, coords, mv - 1, y, X, tspec.spec)
    st = init_state(ms, tspec.bounds, tspec.start, cfg=MCMCConfig(), seed=0)
    ld, ti, XB = st.leveldata, st.tausq_inv, st.XB
    key = jax.random.PRNGKey(0)

    full = lambda w: gibbs_w(ms, ld, w, ti, XB, key)
    print(f"gibbs_w full           {_timed(full, (st.w,)):8.2f} ms")

    # ablations re-implemented inline on the same leveldata
    def ablate(w, *, do_msgs=True, do_scatter=True, do_solve=True):
        tl = ms.tausq_long(ti)
        bigz = jax.random.normal(key, (ms.n + 1,), dtype=ms.dtype)
        acc_chk = jnp.zeros((), ms.dtype)
        for t in reversed(range(len(ms.levels))):
            lvl = ms.levels[t]
            data = ld[t]
            P = lvl.prows.shape[1]
            is_ref = ms.level_is_ref[t]
            seg_off, seg_size = ms.level_segs[t]
            B, S = lvl.rows.shape
            wpar = w[lvl.prows]
            z = bigz[lvl.rows]
            tii = tl[lvl.rows]
            resid = tii * (ms.y[lvl.rows] - XB[lvl.rows])
            hw = (jnp.einsum("bsp,bp->bs", data.H, wpar)
                  if P > 0 else jnp.zeros((B, S), ms.dtype))
            if is_ref:
                if do_solve:
                    Sigi = data.prec + tii[:, :, None] * jnp.eye(S, dtype=ms.dtype)
                    Smu = jnp.einsum("bst,bt->bs", data.prec, hw) + resid
                    _, Lci, _ = chol_inv_masked(Sigi, lvl.rmask, True)
                    tmp = jnp.einsum("bst,bt->bs", Lci, Smu)
                    wu = jnp.einsum("bts,bt->bs", Lci, tmp + z)
                else:
                    wu = hw + z
            else:
                sig = data.prec + tii
                wu = (data.prec * hw + resid) / sig + z / jnp.sqrt(sig)
            wu = jnp.where(lvl.rmask, wu, 0.0)
            if do_scatter:
                w = w.at[lvl.rows].set(wu)
            else:
                acc_chk = acc_chk + jnp.sum(wu)
            if P > 0 and do_msgs:
                if is_ref:
                    AK = jnp.einsum("bsp,bst->bpt", data.H, data.prec)
                else:
                    AK = jnp.einsum("bsp,bs->bps", data.H, data.prec)
                msg_full = jnp.einsum("bps,bs->bp", AK, wu) - jnp.einsum(
                    "bps,bs->bp", AK, hw)
                for a, (o, sa) in enumerate(zip(seg_off, seg_size)):
                    AK_a = AK[:, o:o + sa, :]
                    G_aa = jnp.einsum("bps,bsq->bpq", AK_a,
                                      data.H[:, :, o:o + sa])
                    acc_chk = acc_chk + jnp.sum(G_aa) + jnp.sum(
                        msg_full[:, o:o + sa])
        return w + acc_chk * 1e-37

    print(f"no routing add (msgs computed, not routed/accumulated) ...")
    print(f"  msgs+scatter+solve   {_timed(lambda w: ablate(w), (st.w,)):8.2f} ms")
    print(f"  no msgs              {_timed(lambda w: ablate(w, do_msgs=False), (st.w,)):8.2f} ms")
    print(f"  no msgs, no scatter  {_timed(lambda w: ablate(w, do_msgs=False, do_scatter=False), (st.w,)):8.2f} ms")
    print(f"  scatter only         {_timed(lambda w: ablate(w, do_msgs=False, do_solve=False), (st.w,)):8.2f} ms")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
