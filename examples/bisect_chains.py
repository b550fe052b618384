"""Diagnose multi-chain scaling: what saturates the chip as C grows?

Round-2 measured aggregate chain throughput at n=1e4 of 2.3x at C=2 but only
2.7x at C=4 ("fills execution slack" was asserted, not profiled).  This
harness times the vmapped transition and its two dominant phases at
C = 1, 2, 4, 8 with the dependency-chained loop (the axon relay executes
lazily; see microbench_ops.py), and reports XLA's own bytes-accessed per
iteration so the implied HBM bandwidth can be compared against the measured
~405 GB/s single-chip envelope.  If implied GB/s plateaus near the envelope,
chains contend on HBM (and the multi-chip chains axis is the fix); if it
plateaus far below, the binding resource is kernel-launch/serialization of
the per-level loop.

Usage: python examples/bisect_chains.py [n] [cell_size]
"""

import sys
import time

import numpy as np


def _timed(loop, args, iters=8):
    lo, hi = loop(1), loop(1 + iters)
    float(lo(*args)); float(hi(*args))
    t0 = time.perf_counter()
    float(lo(*args))
    t1 = time.perf_counter()
    float(hi(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1e3


def main(n=10000, cell_size=25):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_univariate
    from spamtree_tpu.model.core import ModelStatic, gibbs_w, sweep
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state, make_step
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    y, y_full, miss, X, coords, mv = make_univariate(n)
    order = np.lexsort((np.arange(len(y)), coords[:, 1], coords[:, 0]))
    y, X, coords = y[order], X[order], coords[order]
    na = np.isfinite(y)
    mv0 = np.zeros(len(y), dtype=np.int64)
    axis = int(round(cell_size ** 0.5))
    tree = make_tree(coords, na, mv0, axis_cell_size=axis, K=2,
                     rng=np.random.default_rng(0))
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 1)
    ms = ModelStatic(sched, coords, mv0, y, X, tspec.spec)
    cfg = MCMCConfig(sample_predicts=False)
    st1 = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    # match production chains (mcmc.stack_chain_states): vmapped chains drop
    # the carried gram -- under vmap the accept-cond runs both branches, so
    # carrying it would bill msg_gram every iteration instead of on accept
    st1 = st1._replace(gram=())
    step = make_step(ms, tspec.bounds, cfg)

    for C in (1, 2, 4, 8):
        sts = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (C,) + a.shape), st1
        )
        vstep = jax.vmap(lambda s, k: step(s, k, False), in_axes=(0, 0))

        def loop_full(k):
            @jax.jit
            def run(s, keys):
                def body(carry, kk):
                    return vstep(carry, kk), None
                return jax.lax.scan(body, s, keys)[0]

            keys = jax.random.split(jax.random.PRNGKey(0), k * C).reshape(
                k, C, 2
            )
            return lambda s: jnp.sum(run(s, keys).theta)

        t_full = _timed(lambda k: (lambda s: loop_full(k)(s)), (sts,))

        # phase pieces under the same vmap (carry perturbation keeps the
        # chain of dependency so the relay cannot elide iterations)
        def piece(fn):
            def mk(k):
                @jax.jit
                def run(s, keys):
                    def body(carry, kk):
                        out = jax.vmap(fn, in_axes=(0, 0))(carry, kk)
                        return carry._replace(
                            w=carry.w + jnp.sum(out) * 1e-37
                        ), None
                    return jax.lax.scan(body, s, keys)[0]

                keys = jax.random.split(jax.random.PRNGKey(0), k * C).reshape(
                    k, C, 2
                )
                return lambda s: jnp.sum(run(s, keys).w)
            return _timed(mk, (sts,))

        t_gw = piece(
            lambda s, k: gibbs_w(ms, s.leveldata, s.w, s.tausq_inv, s.XB, k)
        )
        t_sw = piece(
            lambda s, k: sweep(ms, s.theta, s.w, build_pred=False,
                               quad_prev=s.leveldata)[2]
        )

        # XLA's bytes for ONE vstep at this C (cost model, not measured)
        try:
            ca = jax.jit(vstep).lower(
                sts, jax.random.split(jax.random.PRNGKey(0), C)
            ).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        except Exception:
            gb = float("nan")
        print(
            f"C={C}: full {t_full:7.2f} ms/iter  gibbs_w {t_gw:6.2f}  "
            f"sweep {t_sw:6.2f}  bytes/iter {gb:6.3f} GB  "
            f"implied {gb / (t_full * 1e-3):6.0f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
