"""Per-thunk profile of the VMAPPED multi-chain step (run_mcmc_chains'
form: vmap over the chain axis, accept-cond degenerates to both-branches,
gram recomputed in place).

Round-5 finding to attribute: C=2 chains run ~75 ms/step while the single
chain runs 16.5 ms — a 2.3x per-chain overhead that the joint-w carry did
not touch.  Suspects: vmap-batched gathers (the same scalar-gather
pathology the single-chain path just escaped), the both-branch cond's
unconditional gram_full + pred-operator rebuild, and in-place Gram
formation (chains carry gram=()).

Usage: python examples/profile_chains.py [n_per_q] [cell_size] [C]
"""

import sys
import time

import numpy as np

from profile_step import parse_trace  # noqa: E402  (examples/ on path)


def main(n_per_q=50000, cell_size=25, C=2):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic
    from spamtree_tpu.model.mcmc import (
        MCMCConfig, init_state, make_step, stack_chain_states,
    )
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

    from spamtree_tpu.model.core import level_coords

    cfg = MCMCConfig(accept_aware=False)
    st1 = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    sts = stack_chain_states(st1, np.arange(C))

    @jax.jit
    def loop(s, keys):  # keys (k, C, 2)
        # coords cache built INSIDE jit but OUTSIDE the scan, exactly as
        # run_mcmc_chains._keep_body does -- the hoist under test
        step = make_step(ms, tspec.bounds, cfg,
                         coords_cache=level_coords(ms))
        vstep = jax.vmap(step, in_axes=(0, 0, None))
        f = lambda ss, kk: (vstep(ss, kk, False), None)
        return jax.lax.scan(f, s, keys)[0]

    def run(k, seed):
        r = np.random.default_rng(seed)
        keys = jnp.asarray(
            r.integers(0, 2**31 - 1, size=(k, C, 2)).astype(np.uint32))
        t0 = time.perf_counter()
        out = loop(sts, keys)
        float(jnp.sum(out.theta) + jnp.sum(out.w))
        return time.perf_counter() - t0

    run(1, 99); run(21, 99)
    lo = min(run(1, s) for s in range(3))
    td = "/tmp/chains_trace"
    with jax.profiler.trace(td):
        t_tr = run(21, 5)
    wall_it = (t_tr - lo) / 20 * 1e3
    p = parse_trace(td, 21)
    print(f"C={C}: wall {wall_it:7.2f} ms/step | busy {p['busy_ms_it']:7.2f}"
          f" | module {p['mod_ms_it']:7.2f} | copy-ish {p['copy_ms_it']:5.2f}"
          f" | op-events/it {p['n_op_events']:7.1f}", flush=True)
    for nm, (us, cnt) in p["top"]:
        print(f"    {us/1e3/21:7.3f} ms/it x{cnt/21:6.1f}  {nm[:70]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 25,
         int(sys.argv[3]) if len(sys.argv) > 3 else 2)
