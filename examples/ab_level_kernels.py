"""A/B the fused thin-level Pallas kernels (ops/pallas_level.py) against the
plain-XLA level bodies, in-scan on the real chip.

Times three pieces with the dependency-chained scan harness (see
time_step.py): the decision-only sweep, w-Gibbs with carried Gram blocks
(the hot-path configuration that enables the kernel), and the full
accept-aware burn step.  The SPAMTREE_LEVEL_KERNELS env gate is read at
trace time, so each variant builds fresh jits.

Usage: python examples/ab_level_kernels.py [n_per_q] [cell_size]
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
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 2)
    ms = ModelStatic(sched, coords, mv - 1, y, X, tspec.spec)
    cfg = MCMCConfig()
    st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    step = make_step(ms, tspec.bounds, cfg)

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

    def step_scan(k, s0):
        @jax.jit
        def loop(s, keys):
            f = lambda ss, kk: (step(ss, kk, False), None)
            return jax.lax.scan(f, s, keys)[0]

        keys = jax.random.split(jax.random.PRNGKey(0), k)
        r = loop(s0, keys)
        float(jnp.sum(r.theta))
        t0 = time.perf_counter()
        r = loop(s0, keys)
        float(jnp.sum(r.theta))
        return (time.perf_counter() - t0) * 1e3

    for tag, kern, comp in (
        ("baseline", "0", "0"),
        ("kernels ", "1", "0"),
        ("composed", "0", "1"),
    ):
        os.environ["SPAMTREE_LEVEL_KERNELS"] = kern
        os.environ["SPAMTREE_COMPOSED_FACTORS"] = comp
        t_dec = piece(lambda s, k: sweep(
            ms, s.theta * 1.001, s.w, quad_prev=s.leveldata,
            decision_only=True)[0])
        t_gw = piece(lambda s, k: gibbs_w(
            ms, s.leveldata, s.w, s.tausq_inv, s.XB, k,
            gram=s.gram[0] if len(s.gram) else None,
            routed=s.gram[1] if len(s.gram) else None))
        t1 = step_scan(1, st)
        t21 = step_scan(21, st)
        print(f"[{tag}] decision sweep {t_dec:7.2f} ms | w-gibbs(gram) "
              f"{t_gw:7.2f} ms | burn step {(t21 - t1) / 20:7.2f} ms/iter "
              f"(1-call {t1:.0f} ms)", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
