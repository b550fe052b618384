"""Per-level cost attribution for the decision sweep and w-Gibbs, plus a
kernel-dispatch overhead probe.

Times the decision-only sweep truncated at each level (``sweep(upto=k)``)
and w-Gibbs truncated to the deepest k levels (``gibbs_w(upto=k)``), so the
difference between consecutive rows is one level's cost (emission of a
level's joint factor is attributed to the level that consumes it — the last
included level's emission is DCE'd, see sweep's docstring).

The overhead probe chains K dependent small matmuls inside one jit to bound
the per-kernel fixed cost on this chip: if the step's ~hundreds of kernels
each carry tens of microseconds of ramp, op count — not bytes — is the floor.

Usage: python examples/bisect_levels.py [n_per_q] [cell_size]
"""

import sys
import time

import numpy as np


def _t(fn, iters=20):
    """Dependency-chained timing (see microbench_ops.py: block_until_ready
    alone under-syncs on the axon relay)."""
    import jax
    import jax.numpy as jnp

    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    leaves = jax.tree.leaves(r)
    float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


def probe_overhead():
    import jax
    import jax.numpy as jnp

    for shape, K in (((128, 128), 200), ((8, 128), 200)):
        A = jnp.eye(shape[-1], dtype=jnp.float32) * 0.999

        @jax.jit
        def chain(x, A=A, K=K):
            for _ in range(K):
                x = x @ A
            return x

        x = jnp.ones(shape, dtype=jnp.float32)
        ms_per = _t(lambda: chain(x)) / K * 1e3
        print(f"matmul chain {shape} K={K}: {ms_per:8.2f} us/kernel")


def main(n_per_q=50000, cell_size=25):
    import jax

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic, gibbs_w, sweep
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    print("== kernel overhead probe ==")
    probe_overhead()

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
    L = len(ms.levels)
    for t, lvl in enumerate(ms.levels):
        print(f"L{t}: B={lvl.rows.shape[0]} S={lvl.rows.shape[1]} "
              f"P={lvl.prows.shape[1]} ref={ms.level_is_ref[t]} "
              f"gc={ms.level_group_c[t]} nc={ms.level_chunks[t]}")

    print("== decision sweep, cumulative by level ==")
    prev = 0.0
    for k in range(1, L + 1):
        f = jax.jit(lambda m, th, w, ld, k=k: sweep(
            m, th, w, quad_prev=ld, decision_only=True, upto=k))
        ms_k = _t(lambda: f(ms, st.theta, st.w, st.leveldata))
        print(f"  upto={k}: {ms_k:7.2f} ms  (delta {ms_k - prev:+6.2f})")
        prev = ms_k

    print("== full (emitting) sweep, cumulative by level ==")
    prev = 0.0
    for k in range(1, L + 1):
        f = jax.jit(lambda m, th, w, ld, k=k: sweep(
            m, th, w, quad_prev=ld, upto=k))
        ms_k = _t(lambda: f(ms, st.theta, st.w, st.leveldata))
        print(f"  upto={k}: {ms_k:7.2f} ms  (delta {ms_k - prev:+6.2f})")
        prev = ms_k

    print("== w-Gibbs, cumulative from leaf ==")
    key = jax.random.PRNGKey(0)
    prev = 0.0
    for k in range(1, L + 1):
        f = jax.jit(lambda m, ld, w, ti, xb, kk, k=k: gibbs_w(
            m, ld, w, ti, xb, kk, gram=st.gram[0] if len(st.gram) else None,
            routed=st.gram[1] if len(st.gram) else None, upto=k))
        ms_k = _t(lambda: f(ms, st.leveldata, st.w, st.tausq_inv, st.XB, key))
        print(f"  deepest {k}: {ms_k:7.2f} ms  (delta {ms_k - prev:+6.2f})")
        prev = ms_k


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
