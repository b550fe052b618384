"""Bisect where sweep time goes at benchmark scale.

Times: full fused sweep, sweep without the prediction-operator build,
standalone pred-operator build, and XLA's own flop/byte counts.
Usage: python examples/bisect_sweep.py [n_per_q] [cell_size]
"""

import sys
import time

import numpy as np


def _t(fn, iters=10):
    import jax

    jax.block_until_ready(fn())  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main(n_per_q=50000, cell_size=25):
    import jax

    sys.path.insert(0, ".")
    from bench import make_multivariate
    from spamtree_tpu.model.core import ModelStatic, sweep, gibbs_w
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state
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
    print("pred buckets:", [(p.B, p.S, p.P) for p in (sched.pred_buckets or [])])
    print("pred chunks:", ms.pred_chunks, "in_carry:", ms.pred_in_carry)
    st = init_state(ms, tspec.bounds, tspec.start, cfg=MCMCConfig(), seed=0)

    f_full = jax.jit(lambda m, th, w, ld: sweep(m, th, w, quad_prev=ld))
    f_nopred = jax.jit(
        lambda m, th, w, ld: sweep(m, th, w, build_pred=False, quad_prev=ld)
    )
    f_plain = jax.jit(lambda m, th, w: sweep(m, th, w))
    f_plain_np = jax.jit(lambda m, th, w: sweep(m, th, w, build_pred=False))

    ld = st.leveldata
    print(f"sweep fused + pred      {_t(lambda: f_full(ms, st.theta, st.w, ld)):9.2f} ms")
    print(f"sweep fused, no pred    {_t(lambda: f_nopred(ms, st.theta, st.w, ld)):9.2f} ms")
    print(f"sweep plain + pred      {_t(lambda: f_plain(ms, st.theta, st.w)):9.2f} ms")
    print(f"sweep plain, no pred    {_t(lambda: f_plain_np(ms, st.theta, st.w)):9.2f} ms")

    ex = f_nopred.lower(ms, st.theta, st.w, ld).compile()
    try:
        ca = ex.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print("no-pred flops:", ca.get("flops"), "bytes:",
              ca.get("bytes accessed"))
    except Exception as e:
        print("cost_analysis failed:", e)

    f_gw = jax.jit(lambda m, ld_, w, ti, xb, k: gibbs_w(m, ld_, w, ti, xb, k))
    key = jax.random.PRNGKey(0)
    print(f"gibbs_w                 {_t(lambda: f_gw(ms, ld, st.w, st.tausq_inv, st.XB, key)):9.2f} ms")
    ex2 = f_gw.lower(ms, ld, st.w, st.tausq_inv, st.XB, key).compile()
    try:
        ca = ex2.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print("gibbs_w flops:", ca.get("flops"), "bytes:",
              ca.get("bytes accessed"))
    except Exception as e:
        print("cost_analysis failed:", e)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, c)
