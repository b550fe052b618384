"""Count top-level executed ops in the optimized HLO of step-program
variants (w-only / theta-only / w+theta / forced-reject / no-install).

The in-program per-kernel floor measured on this relay (~0.3 ms/op,
microbench_ops' dependent-matmul probe) predicts step cost ~ 0.3 * kernel
count.  If the w+theta program's top-level op count exceeds the sum of the
pieces', the +5.2 ms composition overhead (bisect_step_blocks round 4) is
extra UNFUSED GLUE; if counts add up, the overhead is per-kernel cost
inflation (scheduling/occupancy), not count.

Usage: python examples/count_kernels.py [n_per_q] [cell_size]
"""

import re
import sys

import numpy as np


def hlo_stats(ex):
    """(top-level op count in entry while-loop body, fusion count) from the
    optimized HLO text of a compiled executable."""
    txt = ex.as_text()
    # the scan lowers to a while loop; its body computation carries the
    # per-iteration kernels.  Find the largest computation by op count --
    # robust to name changes across XLA versions.
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*\{", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            s = line.strip()
            if s.startswith("}"):
                cur = None
            elif "=" in s and not s.startswith("ROOT tuple"):
                comps[cur].append(s)
    if not comps:
        return 0, 0, 0
    body = max(comps, key=lambda k: len(comps[k]))
    ops = comps[body]
    fus = sum(1 for s in ops if " fusion(" in s or s.startswith("fusion"))
    dots = sum(1 for s in ops if " dot(" in s or " custom-call" in s)
    return len(ops), fus, dots


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

    for name, cfg in (
        ("w-only       ", MCMCConfig(sample_theta=False, sample_beta=False,
                                     sample_tausq=False,
                                     sample_predicts=False)),
        ("theta-only   ", MCMCConfig(force_accept=0, sample_w=False,
                                     sample_beta=False, sample_tausq=False,
                                     sample_predicts=False)),
        ("w+theta      ", MCMCConfig(force_accept=0, sample_beta=False,
                                     sample_tausq=False,
                                     sample_predicts=False)),
        ("forced-reject", MCMCConfig(force_accept=0)),
        ("no-install   ", MCMCConfig(theta_no_install=True)),
        ("full step    ", MCMCConfig()),
    ):
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        step = make_step(ms, tspec.bounds, cfg)

        def loop(s, keys):
            f = lambda ss, kk: (step(ss, kk, False), None)
            return jax.lax.scan(f, s, keys)[0]

        keys = jnp.zeros((21, 2), dtype=jnp.uint32)
        ex = jax.jit(loop).lower(st, keys).compile()
        n_ops, n_fus, n_dots = hlo_stats(ex)
        print(f"{name}: body ops {n_ops:4d}  fusions {n_fus:4d}  "
              f"dot/cc {n_dots:4d}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 25)
