"""Hybrid const-model mode (settings const_model="hybrid"): big model
leaves ride as jit arguments, small host-staged leaves fold as literals
(mcmc._split_big_leaves).  Two gates:

1. Chain parity against full const mode — same knobs, same seed, the two
   program forms must produce the same posterior draws (tight allclose;
   constant-vs-argument status must not change the math).
2. The split never folds a DEVICE-resident leaf as a constant: lowering a
   device array literal fetches its value host-side (`ir_constant` ->
   `array._value`), which on the remote-relay TPU backend stalled lowering
   for minutes (round-4 faulthandler capture, BENCH_RESULTS.md).
"""

import numpy as np
import jax
import jax.numpy as jnp

from spamtree_tpu import spamtree
from tests.test_e2e import _sim_univariate


def _fit(cm, **kw):
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    return spamtree(
        y, X, coords, cell_size=16,
        mcmc=dict(keep=40, burn=20, thin=1),
        settings=dict(const_model=cm, chunk=10),
        dtype=jnp.float64, seed=5, **kw,
    )


def test_hybrid_matches_const_chain():
    a = _fit(True)
    b = _fit("hybrid")
    for k in ("w_mcmc", "theta_mcmc", "tausq_mcmc", "beta_mcmc"):
        assert np.allclose(a[k], b[k], rtol=1e-8, atol=1e-10), k
    assert a["order"].tolist() == b["order"].tolist()


def test_split_keeps_device_leaves_as_arguments():
    from spamtree_tpu.model.mcmc import _leaf_is_arg

    thresh = 1e6
    assert not _leaf_is_arg(np.arange(8, dtype=np.float32), thresh)
    assert _leaf_is_arg(np.zeros(600_000, dtype=np.float32), thresh)
    # a device array below the size threshold must STILL be an argument
    assert _leaf_is_arg(jnp.arange(8, dtype=jnp.float32), thresh)
    # non-array pytree leaves must not raise, and fold as constants
    assert not _leaf_is_arg(3, thresh)
    assert not _leaf_is_arg(None, thresh)


def test_split_folds_small_leaves_after_materialize():
    """A model materialized BEFORE the split (eager init / checkpoint load)
    must still constant-fold its small leaves via the retained host
    snapshot instead of silently degenerating to pure argument mode
    (round-4 advisor finding)."""
    from spamtree_tpu.model.core import ModelStatic
    from spamtree_tpu.model.mcmc import _split_big_leaves
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    na = np.isfinite(y)
    mv = np.zeros(len(y), dtype=np.int64)
    spec = make_theta_spec(2, 1).spec

    def _ms():
        tree = make_tree(coords, na, mv, axis_cell_size=4, K=2,
                         rng=np.random.default_rng(0))
        return ModelStatic(build_schedule(tree), coords, mv, y, X, spec,
                           dtype=jnp.float64)

    n_args_fresh = len(_split_big_leaves(_ms(), thresh=1e6)[0])
    ms = _ms()
    ms.materialize_device()
    big, rebuild = _split_big_leaves(ms, thresh=1e6)
    # the retained host snapshot must restore the same split as on a
    # host-staged model (only the always-device global fields stay args)
    assert len(big) == n_args_fresh, (
        f"hybrid split degenerated after materialize: {len(big)} argument "
        f"leaves vs {n_args_fresh} on the host-staged model"
    )
    m2 = rebuild(big)
    got = jax.tree.leaves((m2.levels, m2.y, m2.X))
    want = jax.tree.leaves((ms.levels, ms.y, ms.X))
    for a, b in zip(got, want):
        assert np.array_equal(np.asarray(a), np.asarray(b))
