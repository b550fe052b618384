"""Bisect the cold-setup compile spans: materializer vs lazy-state builder
vs keep-scan program.

The setup breakdown in bench.py lumps the model-array materializer compile
into init_state_s (staging dispatches asynchronously; the first host fetch
that blocks on it is init_state's _force).  This harness times each remote
compile separately so the overlap/merge work can target the biggest span.

Usage:
    SPAMTREE_COMPILE_CACHE=/tmp/fresh$(date +%s) \
        python examples/setup_compile_bisect.py [n] [limited]

A fresh cache dir simulates a cold cache; rerun with the same dir for the
warm numbers.  Pass n (default 100000) and "limited" for the config-5-style
limited tree.
"""

import sys
import time

import numpy as np


def main(n=100000, limited=False):
    import jax

    sys.path.insert(0, ".")
    from bench import make_univariate
    from spamtree_tpu.model.core import ModelStatic
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    y, y_full, miss, X, coords, _mv = make_univariate(n)
    order = np.lexsort((np.arange(len(y)), coords[:, 1], coords[:, 0]))
    y, X, coords = y[order], X[order], coords[order]
    na = np.isfinite(y)
    t0 = time.perf_counter()
    tree = make_tree(coords, na, np.zeros(len(y), dtype=np.int64),
                     axis_cell_size=5, K=2, rng=np.random.default_rng(0),
                     limited_tree=limited)
    sched = build_schedule(tree)
    t1 = time.perf_counter()
    print(f"tree+schedule      {t1 - t0:8.2f} s")

    tspec = make_theta_spec(2, 1)

    # ModelStatic packs host-side, device_puts two packed buffers, and CALLS
    # the jitted _materialize -- the call blocks on its compile, execution is
    # async.  Time the construction call and the output-force separately.
    t0 = time.perf_counter()
    ms = ModelStatic(sched, coords, np.zeros(len(y), dtype=np.int64), y, X,
                     tspec.spec)
    t1 = time.perf_counter()
    np.asarray(ms.y[:1])  # force the global-array puts
    t2 = time.perf_counter()
    print(f"ModelStatic call   {t1 - t0:8.2f} s   (host staging + global "
          f"puts; const-model runs stop here)")
    ms.materialize_device()
    jax.block_until_ready(ms.levels)
    t3 = time.perf_counter()
    print(f"global-put force   {t2 - t1:8.2f} s")
    print(f"materialize_device {t3 - t2:8.2f} s   (packed transfer + unpack "
          f"compile; argument-mode/sharded runs only)")

    # lazy state builder: the jit call blocks on ITS compile
    cfg = MCMCConfig()
    t0 = time.perf_counter()
    st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0, lazy=True)
    t1 = time.perf_counter()
    np.asarray(st.key)
    t2 = time.perf_counter()
    print(f"lazy builder call  {t1 - t0:8.2f} s   (builder compile)")
    print(f"builder force      {t2 - t1:8.2f} s")

    # keep-scan program, exactly as run_mcmc lowers it (argument mode)
    from spamtree_tpu.model import mcmc as M

    t0 = time.perf_counter()
    out = M.run_mcmc(ms, tspec.bounds,
                     cfg._replace(burn=1, keep=1, chunk=1), st,
                     precompile=True, const_model=False)
    t1 = time.perf_counter()
    print(f"run_mcmc(1+1)      {t1 - t0:8.2f} s   compile_time_s="
          f"{out.get('compile_time_s')} phases={out.get('compile_phases')}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    limited = len(sys.argv) > 2 and sys.argv[2].startswith("lim")
    main(n, limited)
