"""A/B the 128-aligned layouts (schedule joint_align / thin_s_align) for
the fused thin-level Pallas kernels — the round-4 negative result's
untested falsification (VERDICT r5 item 2).

Round 4 measured the fused decision-leaf kernel at ~11 ms vs XLA's 6.5 ms
and diagnosed unaligned block DMA on the (1024, 296, 296) factor batch
(P = 296 not 128-divisible).  The schedule can pad the deepest joint
layout to 384 (joint_align=128) and the thin block width S 68 -> 128
(thin_s_align) — this harness measures the decision sweep / w-Gibbs /
burn step on every (layout x kernel-gate) combination, including the
aligned VPU kernel variant (no augmented column, u = LAi wpar on-chip).

Usage: python examples/ab_aligned.py [n_per_q] [cell_size]
"""

import os
import sys
import time

import numpy as np


def main(n_per_q=50000, cell_size=25):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic, gibbs_w, sweep
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state, make_step
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    y, y_full, miss, X, coords, mv = make_multivariate(n_per_q, 2)
    order = np.lexsort((np.arange(len(y)), coords[:, 1], coords[:, 0]))
    y, X, coords, mv = y[order], X[order], coords[order], mv[order]
    na = np.isfinite(y)
    axis = int(round(cell_size ** 0.5))
    tree = make_tree(coords, na, mv - 1, axis_cell_size=axis, K=2,
                     rng=np.random.default_rng(0))
    tspec = make_theta_spec(2, 2)

    models = {}
    for tag, kw in (
        ("base      ", {}),
        ("J128      ", dict(joint_align=128)),
        ("J128+S128 ", dict(joint_align=128, thin_s_align=128)),
    ):
        sched = build_schedule(tree, **kw)
        ms = ModelStatic(sched, coords, mv - 1, y, X, tspec.spec)
        deep = [
            (t, ms.levels[t].rows.shape, ms.levels[t].prows.shape[1],
             ms.level_is_ref[t])
            for t in range(len(ms.levels))
        ][-3:]
        print(f"{tag}: deepest levels (t, (B,S), P, ref) = {deep}",
              flush=True)
        models[tag.strip()] = ms

    def piece(ms, st, fn, k=20):
        @jax.jit
        def loop(s, keys):
            def body(carry, key):
                s = carry
                out = fn(s, key)
                eps = jnp.sum(out) * 1e-37 + jax.random.uniform(
                    key, (), dtype=s.theta.dtype
                ) * 1e-30
                return s._replace(
                    w=s.w + eps, theta=s.theta * (1.0 + eps)
                ), None

            return jax.lax.scan(body, s, keys)[0]

        keys = jax.random.split(jax.random.PRNGKey(0), k)
        r = loop(st, keys); float(jnp.sum(r.w))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            r = loop(st, keys); float(jnp.sum(r.w))
            t1 = time.perf_counter()
            keys1 = jax.random.split(jax.random.PRNGKey(0), 1)
            r = loop(st, keys1); float(jnp.sum(r.w))
            t2 = time.perf_counter()
            r = loop(st, keys1); float(jnp.sum(r.w))
            t3 = time.perf_counter()
            best = min(best, ((t1 - t0) - (t3 - t2)) / (k - 1) * 1e3)
        return best

    cfg = MCMCConfig()
    for mtag, kern, comp in (
        ("base", "0", "1"),   # production default: composed parts, no kernel
        ("base", "0", "0"),   # dense joint, XLA levels
        ("base", "1", "0"),   # unaligned pallas kernel (r4 negative)
        ("J128", "0", "0"),   # padding cost on the XLA path
        ("J128", "1", "0"),   # ALIGNED pallas kernel (VPU variant)
        ("J128+S128", "0", "0"),
        ("J128+S128", "1", "0"),
    ):
        os.environ["SPAMTREE_LEVEL_KERNELS"] = kern
        os.environ["SPAMTREE_COMPOSED_FACTORS"] = comp
        ms = models[mtag]
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        t_dec = piece(ms, st, lambda s, k: sweep(
            ms, s.theta * 1.001, s.w, quad_prev=s.leveldata,
            decision_only=True)[0])
        t_gw = piece(ms, st, lambda s, k: gibbs_w(
            ms, s.leveldata, s.w, s.tausq_inv, s.XB, k,
            gram=s.gram[0] if len(s.gram) else None,
            routed=s.gram[1] if len(s.gram) else None))
        print(f"[{mtag:10s} kern={kern} comp={comp}] decision sweep "
              f"{t_dec:7.2f} ms | w-gibbs(gram) {t_gw:7.2f} ms", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
