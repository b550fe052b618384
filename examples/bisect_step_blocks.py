"""Sampler-ablation bisect of the in-scan transition: time the step with
whole sampler blocks disabled (debug flags, reference spamtree_fit.R:18-20)
under the fresh-key dependency-chained harness.

Round-3 finding at n=1e5 (BENCH_RESULTS.md): no-theta = 10.3 ms ~ w-Gibbs
(8.2) + predict (2.4), so carrying the 155.6 MB factor set through the
donated scan carry is ~free; the full-step residual beyond the measured
pieces lives inside the theta-MH block (accept-cond output
materialization + on-accept derived rebuilds)."""
import os
import sys
import time

import numpy as np


def main(n_per_q=50000, cell_size=25):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic
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

    only = [s for s in os.environ.get("BISECT_ONLY", "").split(",") if s]
    for name, cfg in (
        ("full step       ", MCMCConfig()),
        # pinned MH decisions split the theta-block residual: forced-reject
        # times sweep + cond forward path; forced-accept times sweep + swap
        # + on-accept msg-Gram/prediction rebuilds.  full ~ w-Gibbs blocks
        # + sweep + p*accept_cost + (1-p)*reject_cost
        ("forced-reject   ", MCMCConfig(force_accept=0)),
        ("forced-accept   ", MCMCConfig(force_accept=1)),
        # decision math without the install cond: (forced-reject -
        # no-install) isolates the cond+install machinery exactly
        ("no-install      ", MCMCConfig(theta_no_install=True)),
        ("no-theta step   ", MCMCConfig(sample_theta=False)),
        ("w-only step     ", MCMCConfig(sample_theta=False, sample_beta=False,
                                        sample_tausq=False,
                                        sample_predicts=False)),
        # theta block in isolation (forced-reject so no install): decision
        # sweep + the tiny-op chain (proposal transform, jacobian, prior,
        # accept scalar math, RAM adapt).  theta-noadapt subtracts the RAM
        # update; (theta-only - noadapt) = RAM adapt's serialized tiny
        # kernels, (noadapt - standalone decision sweep) = the rest
        ("theta-only      ", MCMCConfig(force_accept=0, sample_w=False,
                                        sample_beta=False, sample_tausq=False,
                                        sample_predicts=False)),
        ("theta-noadapt   ", MCMCConfig(force_accept=0, sample_w=False,
                                        sample_beta=False, sample_tausq=False,
                                        sample_predicts=False,
                                        adapting=False)),
        # pairwise composition probes (forced-reject): theta-only measured
        # 6.07 ms and no-theta 10.35 yet forced-reject is 21.78 -- ~5.4 ms
        # appears only when blocks share one program.  w+theta / theta+pred
        # localize which pairing pays it
        ("w+theta         ", MCMCConfig(force_accept=0, sample_beta=False,
                                        sample_tausq=False,
                                        sample_predicts=False)),
        # (predict is gated on sample_w, so w+theta+pred is the other pair)
        ("w+theta+pred    ", MCMCConfig(force_accept=0, sample_beta=False,
                                        sample_tausq=False)),
        # legacy always-emit step (accept_aware off): ONE sweep per
        # iteration that always emits factors, cond only swaps buffers.
        # With the round-5 joint-w carry the emission cost may no longer
        # justify accept-aware's doubled program (2x backend compile,
        # BENCH_r04's 131 s) -- these rows decide the default
        ("legacy full     ", MCMCConfig(accept_aware=False)),
        ("legacy-reject   ", MCMCConfig(accept_aware=False, force_accept=0)),
        ("legacy-accept   ", MCMCConfig(accept_aware=False, force_accept=1)),
    ):
        if only and not any(name.startswith(o) for o in only):
            continue
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        step = make_step(ms, tspec.bounds, cfg)

        @jax.jit
        def loop(s, keys):
            f = lambda ss, kk: (step(ss, kk, False), None)
            return jax.lax.scan(f, s, keys)[0]

        def run(k, seed):
            r = np.random.default_rng(seed)
            keys = jnp.asarray(
                r.integers(0, 2**31 - 1, size=(k, 2)).astype(np.uint32))
            t0 = time.perf_counter()
            out = loop(st, keys)
            float(jnp.sum(out.theta) + jnp.sum(out.w))
            return time.perf_counter() - t0

        run(1, 99); run(21, 99)  # compile both shapes
        lo = min(run(1, s) for s in range(3))
        hi = min(run(21, s) for s in range(3))
        print(f"{name}: {(hi - lo) / 20 * 1e3:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
