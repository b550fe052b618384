"""Per-thunk device-time attribution of the step-program variants via the
JAX profiler (works through the axon relay: the trace carries a
/device:TPU:0 track with per-XLA-op timing).

For each variant: run one 21-iteration scan under jax.profiler.trace,
aggregate the device track's XLA-op events, and report
  - device BUSY ms/iter vs WALL ms/iter (gap = dispatch/serialization),
  - the copy/data-movement share of busy time,
  - the top ops by total time.
If the w+theta program's busy time ~ sum of the parts' but its wall is
larger, the composition overhead is scheduling gaps; if busy itself grows,
the extra copies/thunks are real device work (VERDICT r5 item 1).

Usage: python examples/profile_step.py [n_per_q] [cell_size]
       BISECT_ONLY=w+theta python examples/profile_step.py
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

COPY_TOKENS = ("copy", "transpose", "bitcast", "convert", "reshape")


def parse_trace(trace_dir, n_iters):
    runs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    path = runs[-1]
    d = json.load(gzip.open(path))
    evs = d.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in evs
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in tpu_pids}
    mod_tids = {(e["pid"], e["tid"]) for e in evs
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Modules"
                and e["pid"] in tpu_pids}
    ops = {}
    busy_us = 0.0
    mod_us = 0.0
    for e in evs:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in op_tids:
            dur = float(e.get("dur", 0))
            busy_us += dur
            nm = e.get("name", "")
            st = ops.setdefault(nm, [0.0, 0])
            st[0] += dur
            st[1] += 1
        elif key in mod_tids:
            mod_us += float(e.get("dur", 0))
    copy_us = sum(v[0] for k, v in ops.items()
                  if any(t in k for t in COPY_TOKENS))
    return dict(busy_ms_it=busy_us / 1e3 / n_iters,
                mod_ms_it=mod_us / 1e3 / n_iters,
                copy_ms_it=copy_us / 1e3 / n_iters,
                n_op_events=sum(v[1] for v in ops.values()) / n_iters,
                top=sorted(ops.items(), key=lambda kv: -kv[1][0])[:18])


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

    base = dict(force_accept=0, sample_beta=False, sample_tausq=False,
                sample_predicts=False)
    only = [s for s in os.environ.get("BISECT_ONLY", "").split(",") if s]
    for name, cfg in (
        ("w-only       ", MCMCConfig(sample_theta=False, sample_beta=False,
                                     sample_tausq=False,
                                     sample_predicts=False)),
        ("theta-only   ", MCMCConfig(sample_w=False, **base)),
        ("w+theta      ", MCMCConfig(**base)),
        ("forced-reject", MCMCConfig(force_accept=0)),
    ):
        if only and not any(name.strip().startswith(o) for o in only):
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
            float(jnp.sum(out.theta) + jnp.sum(out.w) + jnp.sum(out.beta)
                  + jnp.sum(out.tausq_inv))
            return time.perf_counter() - t0

        run(1, 99); run(21, 99)  # compile + warm
        lo = min(run(1, s) for s in range(3))
        td = f"/tmp/step_trace_{name.strip().replace('+', '_')}"
        with jax.profiler.trace(td):
            t_tr = run(21, 5)
        wall_it = (t_tr - lo) / 20 * 1e3
        p = parse_trace(td, 21)
        print(f"\n=== {name}: wall {wall_it:6.2f} ms/it | device busy "
              f"{p['busy_ms_it']:6.2f} | module {p['mod_ms_it']:6.2f} | "
              f"copy-ish {p['copy_ms_it']:5.2f} | op-events/it "
              f"{p['n_op_events']:6.1f}", flush=True)
        for nm, (us, cnt) in p["top"]:
            print(f"    {us/1e3/21:7.3f} ms/it x{cnt/21:6.1f}  {nm[:70]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
