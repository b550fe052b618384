"""Diagnose multi-chain scaling: what saturates the chip as C grows?

Round-2 measured aggregate chain throughput at n=1e4 of 2.3x at C=2 but only
2.7x at C=4 ("fills execution slack" was asserted, not profiled).  This
harness times the vmapped transition at C = 1, 2, 4, 8 with the
dependency-chained loop (the axon relay executes lazily; see
microbench_ops.py), and reports XLA's own bytes-accessed per iteration so
the implied HBM bandwidth can be compared against the measured ~405 GB/s
single-chip envelope.  If implied GB/s plateaus near the envelope,
chains contend on HBM (and the multi-chip chains axis is the fix); if it
plateaus far below, the binding resource is kernel-launch/serialization of
the per-level loop.

Usage: python examples/bisect_chains.py [n] [cell_size]
"""

import sys
import time

import numpy as np


def _timed(run, s, C, iters=50, reps=3):
    """Per-iteration ms from (long scan - short scan), min over reps.

    Two landmines on this machine (docs/DESIGN.md §6): the 50 ms host round
    trip swamps single-iteration differences, and re-running a
    byte-identical computation is served from the relay's result cache, so
    repeated timings of the same (program, inputs) pair measure nothing
    (observed: negative 'per-iter' times).  Every timed call here therefore
    gets FRESH key material, and the per-iteration cost is the difference
    of min-over-reps scan times at k=1 vs k=1+iters."""
    import jax.numpy as jnp

    def keys(rep, k):
        r = np.random.default_rng(7919 * rep + k)
        return jnp.asarray(
            r.integers(0, 2**31 - 1, size=(k, C, 2)).astype(np.uint32)
        )

    float(run(s, keys(99, 1)))           # compile both shapes
    float(run(s, keys(99, 1 + iters)))
    t = {}
    for k in (1, 1 + iters):
        best = float("inf")
        for rep in range(reps):
            ks = keys(rep, k)
            t0 = time.perf_counter()
            float(run(s, ks))
            best = min(best, time.perf_counter() - t0)
        t[k] = best
    return (t[1 + iters] - t[1]) / iters * 1e3


def main(n=10000, cell_size=25):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_univariate
    from spamtree_tpu.model.core import ModelStatic
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

        @jax.jit
        def run(s, keys):
            def body(carry, kk):
                return vstep(carry, kk), None
            return jnp.sum(jax.lax.scan(body, s, keys)[0].theta)

        t_full = _timed(run, sts, C)

        # XLA's bytes for ONE vstep at this C (cost model, not measured)
        try:
            ca = jax.jit(vstep).lower(
                sts, jax.random.split(jax.random.PRNGKey(0), C)
            ).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        except Exception:
            gb = float("nan")
        agg = C / t_full * 1e3
        if C == 1:
            agg1 = agg
        print(
            f"C={C}: full {t_full:7.2f} ms/iter  aggregate {agg:7.0f} "
            f"chain-iters/s ({agg / agg1:4.2f}x)  bytes/iter {gb:6.3f} GB  "
            f"implied {gb / (t_full * 1e-3):6.0f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
