"""Time one full MCMC transition (and its pieces) with the dependency-chained
harness (see microbench_ops.py for why block_until_ready is not enough on the
axon relay).
Usage: python examples/time_step.py [n_per_q] [cell_size] [factor_dtype]
(factor_dtype e.g. bfloat16 enables storage-only downcast of the propagated
joint factors -- the A/B for VERDICT round-2 item 6)
"""

import sys
import time

import numpy as np


def main(n_per_q=50000, cell_size=25, factor_dtype=None):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic, gibbs_w, predict, sweep
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
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 2)
    ms = ModelStatic(sched, coords, mv - 1, y, X, tspec.spec,
                     factor_dtype=factor_dtype)
    cfg = MCMCConfig()
    st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    step = make_step(ms, tspec.bounds, cfg)

    def time_scan(predicting, k, s0):
        @jax.jit
        def loop(s, keys):
            f = lambda ss, kk: (step(ss, kk, predicting), None)
            return jax.lax.scan(f, s, keys)[0]

        keys = jax.random.split(jax.random.PRNGKey(0), k)
        r = loop(s0, keys)
        float(jnp.sum(r.theta))  # force
        t0 = time.perf_counter()
        r = loop(s0, keys)
        float(jnp.sum(r.theta))
        return (time.perf_counter() - t0) * 1e3

    variants = [("", st)]
    if len(st.gram) > 0:
        # A/B the carried accept-refreshed Gram blocks against in-place
        # recomputation (what vmapped chains do)
        variants.append((" no-gram", st._replace(gram=())))
    for suffix, s0 in variants:
        for name, pred in (("burn step", False), ("keep step", True)):
            t1 = time_scan(pred, 1, s0)
            t21 = time_scan(pred, 21, s0)
            print(f"{name}{suffix}: {(t21 - t1) / 20:8.2f} ms/iter  "
                  f"(1-iter call {t1:.1f} ms)")

    # pieces, same harness style: scan over a cheap carry perturbation.
    # BOTH w and theta must be perturbed from the loop key: the factor chain
    # depends only on theta, so a theta-invariant loop lets XLA hoist the
    # entire sweep out of the scan (measured: 19 ms -> 0.2 ms "per iter").
    def piece(fn, k=20):
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
        t0 = time.perf_counter()
        r = loop(st, keys); float(jnp.sum(r.w))
        t1 = time.perf_counter()
        keys1 = jax.random.split(jax.random.PRNGKey(0), 1)
        r = loop(st, keys1); float(jnp.sum(r.w))
        t2 = time.perf_counter()
        r = loop(st, keys1); float(jnp.sum(r.w))
        t3 = time.perf_counter()
        return ((t1 - t0) - (t3 - t2)) / (k - 1) * 1e3

    t_sweep = piece(lambda s, k: sweep(ms, s.theta, s.w, quad_prev=s.leveldata)[2])
    print(f"fused sweep+pred inside scan: {t_sweep:8.2f} ms")
    t_sweepnp = piece(
        lambda s, k: sweep(ms, s.theta, s.w, build_pred=False, quad_prev=s.leveldata)[2]
    )
    print(f"fused sweep no-pred          : {t_sweepnp:8.2f} ms")
    t_gw = piece(lambda s, k: gibbs_w(ms, s.leveldata, s.w, s.tausq_inv, s.XB, k))
    print(f"gibbs_w inside scan          : {t_gw:8.2f} ms")
    t_pr = piece(lambda s, k: predict(ms, s.pred_data, s.w, k))
    print(f"predict inside scan          : {t_pr:8.2f} ms")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    fd = sys.argv[3] if len(sys.argv) > 3 else None
    main(n, c, fd)
