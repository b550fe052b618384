"""Attribute the w+theta composition overhead (round-4 bisect: w-Gibbs
alone 8.35 ms + theta alone 6.07 ms but w+theta in ONE program 19.65 ms,
and beta+tausq add another +2.1 ms; VERDICT r4 item 1).

Two instruments per program variant, both on the SAME compiled executable:

1. dependency-chained in-scan timing (as bisect_step_blocks);
2. an optimized-HLO audit of the scan's while-body: top-level thunk count,
   fusion/dot counts, and BYTES moved by pure data-movement ops (copy /
   bitcast-convert / transpose fusions) -- if the combined program's copy
   bytes or thunk count exceed the sum of its parts, the overhead is named.

Probe variants isolate mechanisms:
- ``w+theta stale-w``: the decision sweep consumes the PRE-Gibbs w
  (MCMCConfig.theta_stale_w), removing the w-Gibbs -> sweep data
  dependency.  If this recovers the sum-of-parts time, the overhead is
  critical-path serialization (neither block's kernels can overlap the
  other's); if not, it is structural (copies, layout, allocation).
- ``w+theta nogram``: state.gram=() drops the carried routed-Gram pair;
  isolates the gram cond-forwarding cost.
- ``w+theta noinstall``: full decision math, no install cond at all.
- ``bt-only``: beta+tausq (+XB refresh) without w/theta -- the +2.1 ms
  tail in isolation.

Usage: python examples/probe_composition.py [n_per_q] [cell_size]
       BISECT_ONLY=w+theta,bt-only python examples/probe_composition.py
"""

import os
import re
import sys
import time

import numpy as np

_DT_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def _shape_bytes(sh: str) -> int:
    """Bytes of one HLO shape string like 'f32[1024,296,296]{2,1,0}'."""
    m = re.match(r"(\w+)\[([\d,]*)\]", sh)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    nb = _DT_BYTES.get(dt, 4)
    for d in dims.split(","):
        if d:
            nb *= int(d)
    return nb


def hlo_audit(ex):
    """Audit the largest computation (the scan while-body) of a compiled
    executable: thunk count, fusions, dots, and data-movement bytes."""
    txt = ex.as_text()
    comps, cur = {}, None
    for line in txt.splitlines():
        m = re.match(r"^\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*\{", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            s = line.strip()
            if s.startswith("}"):
                cur = None
            elif "=" in s:
                comps[cur].append(s)
    if not comps:
        return {}
    body = max(comps, key=lambda k: len(comps[k]))
    ops = comps[body]
    stats = dict(ops=len(ops), fusion=0, dot=0, copy=0, copy_mb=0.0,
                 all_mb=0.0, body=body)
    for s in ops:
        out_m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|\S+)\s+(\w[\w\-]*)\(", s)
        if not out_m:
            continue
        shape, opname = out_m.group(1), out_m.group(2)
        nb = sum(_shape_bytes(p) for p in re.findall(r"\w+\[[\d,]*\][^,)]*", shape)) \
            if shape.startswith("(") else _shape_bytes(shape)
        stats["all_mb"] += nb / 1e6
        if opname == "fusion":
            stats["fusion"] += 1
        if opname in ("dot", "custom-call", "convolution"):
            stats["dot"] += 1
        if opname in ("copy", "transpose", "bitcast-convert", "copy-start"):
            stats["copy"] += 1
            stats["copy_mb"] += nb / 1e6
        # fusions that are pure data movement: kind=kLoop with copy root is
        # not visible here; the named copy ops are the reliable signal
    return stats


def main(n_per_q=50000, cell_size=25, dump_dir=None):
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
    for name, cfg, nogram in (
        ("w-only          ", MCMCConfig(sample_theta=False, sample_beta=False,
                                        sample_tausq=False,
                                        sample_predicts=False), False),
        ("theta-only      ", MCMCConfig(sample_w=False, **base), False),
        ("w+theta         ", MCMCConfig(**base), False),
        ("w+theta stale-w ", MCMCConfig(theta_stale_w=True, **base), False),
        ("w+theta nogram  ", MCMCConfig(**base), True),
        ("w+theta noinstal", MCMCConfig(theta_no_install=True,
                                        sample_beta=False, sample_tausq=False,
                                        sample_predicts=False), False),
        ("bt-only         ", MCMCConfig(sample_theta=False, sample_w=False,
                                        sample_predicts=False), False),
        ("forced-reject   ", MCMCConfig(force_accept=0), False),
    ):
        if only and not any(name.strip().startswith(o) for o in only):
            continue
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        if nogram:
            st = st._replace(gram=())
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

        ex21 = None
        try:
            r = np.random.default_rng(99)
            keys21 = jnp.asarray(
                r.integers(0, 2**31 - 1, size=(21, 2)).astype(np.uint32))
            ex21 = jax.jit(loop).lower(st, keys21).compile()
        except Exception as e:
            print(f"{name}: audit-compile failed: {e}", flush=True)
        run(1, 99); run(21, 99)
        lo = min(run(1, s) for s in range(3))
        hi = min(run(21, s) for s in range(3))
        ms_it = (hi - lo) / 20 * 1e3
        audit = hlo_audit(ex21) if ex21 is not None else {}
        print(f"{name}: {ms_it:7.2f} ms/iter | thunks {audit.get('ops', 0):4d}"
              f"  fus {audit.get('fusion', 0):4d}  dot {audit.get('dot', 0):4d}"
              f"  copies {audit.get('copy', 0):3d} ({audit.get('copy_mb', 0.0):7.1f} MB)"
              f"  out-bytes {audit.get('all_mb', 0.0):8.1f} MB", flush=True)
        if dump_dir and ex21 is not None:
            os.makedirs(dump_dir, exist_ok=True)
            with open(os.path.join(dump_dir, name.strip().replace("+", "_")
                                   + ".hlo.txt"), "w") as f:
                f.write(ex21.as_text())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 25,
         dump_dir=os.environ.get("HLO_DUMP_DIR"))
