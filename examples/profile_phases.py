"""Per-phase TPU profiling at benchmark scale.

Usage: python examples/profile_phases.py [n_per_q] [cell_size]
Prints ms/phase (compile excluded) and the implied iters/sec.
"""

import sys

import numpy as np


def main(n_per_q=50000, cell_size=25):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule
    from spamtree_tpu.utils.diagnostics import time_phases

    y, y_full, miss, X, coords, mv = make_multivariate(n_per_q, 2)
    order = np.lexsort((np.arange(len(y)), coords[:, 1], coords[:, 0]))
    y, X, coords, mv = y[order], X[order], coords[order], mv[order]
    na = np.isfinite(y)
    axis = int(round(cell_size ** 0.5))
    tree = make_tree(coords, na, mv - 1, axis_cell_size=axis, K=2,
                     rng=np.random.default_rng(0))
    sched = build_schedule(tree)
    print("levels:", [(p.res, p.is_ref, p.B, p.S, p.P) for p in sched.levels])
    tspec = make_theta_spec(2, 2)
    ms = ModelStatic(sched, coords, mv - 1, y, X, tspec.spec)
    print("chunks:", ms.level_chunks, "pred:", ms.pred_chunks)
    st = init_state(ms, tspec.bounds, tspec.start, cfg=MCMCConfig(), seed=0)
    res = time_phases(ms, st, iters=10)
    for k, v in res.items():
        print(f"{k:24s} {v:9.2f} ms")
    per_iter = res["total_per_iter"]
    print(f"-> ~{per_iter:.1f} ms/iter (+{res['predict']:.1f} on kept) "
          f"= {1000/per_iter:.2f} iters/sec")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
