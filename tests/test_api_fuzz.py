"""Knob-combination fuzz over the PUBLIC spamtree() surface.

The reference's option lists (mcmc/settings/prior/starting/debug,
spamtree_fit.R:12-20) multiply into a large configuration space; each
combination below runs a tiny fit end-to-end and checks the structural
contract (shapes, finiteness, order mapping, acceptance bookkeeping)
rather than statistical recovery (covered by test_e2e).  The grid is a
covering sample, not the full product: every knob value appears in at
least two combinations, crossed against different partners."""

import numpy as np
import jax.numpy as jnp
import pytest

from spamtree_tpu import spamtree


def _data(n_per_q, q, miss, seed=5):
    rng = np.random.default_rng(seed)
    if q == 1:
        coords = rng.uniform(size=(n_per_q, 2))
        mv = None
        n = n_per_q
    else:
        base = rng.uniform(size=(n_per_q, 2))
        coords = np.repeat(base, q, axis=0)
        mv = np.tile(np.arange(1, q + 1), n_per_q)
        n = len(coords)
    X = rng.normal(size=(n, 2))
    y = X @ np.array([1.0, -0.5]) + rng.normal(size=n)
    if miss:
        y[rng.uniform(size=n) < miss] = np.nan
    return y, X, coords, mv


# (q, miss, limited_tree, thin, n_chains, collect, wire, extra)
GRID = [
    (1, 0.0, False, 1, 1, "all", "none", {}),
    (1, 0.15, True, 2, 1, "all", None, {}),
    (1, 0.15, False, 1, 2, "summary", "none", dict(summary_draws=3)),
    (1, 0.0, True, 1, 2, "all", None, {}),
    (2, 0.15, False, 2, 1, "summary", "none", {}),
    (2, 0.0, True, 1, 1, "all", "float16", {}),
    (2, 0.15, True, 2, 2, "all", "none", {}),
    (3, 0.15, False, 1, 1, "all", "none", dict(mvbias=0.5)),
    (3, 0.0, True, 2, 2, "summary", "none", dict(summary_draws=2)),
    (2, 0.15, False, 1, 1, "all", "none", dict(theta_prior=True)),
]


@pytest.mark.parametrize("q,miss,limited,thin,n_chains,collect,wire,extra",
                         GRID)
def test_knob_combination(q, miss, limited, thin, n_chains, collect, wire,
                          extra):
    y, X, coords, mv = _data(72 if q == 3 else 100, q, miss)
    n = len(coords)
    keep, burn = 6, 4
    settings = dict(chunk=4, collect=collect)
    if wire is not None:
        settings["wire_dtype"] = wire
    settings.update({k: v for k, v in extra.items() if k == "summary_draws"})
    kwargs = {}
    if "mvbias" in extra:
        kwargs["mvbias"] = extra["mvbias"]
    prior = None
    if extra.get("theta_prior"):
        prior = dict(theta=[("gamma", 2.0, 1.0)] * (3 * q + (3 if q > 2 else 1)
                                                    + q * (q - 1) // 2))
    dtype = jnp.float32 if wire == "float16" else jnp.float64
    out = spamtree(
        y, X, coords, mv_id=mv, cell_size=9, K=2,
        limited_tree=limited,
        mcmc=dict(keep=keep, burn=burn, thin=thin),
        settings=settings, n_chains=n_chains, seed=7, dtype=dtype,
        prior=prior, **kwargs,
    )
    # order is a permutation of the rows
    order = out["order"]
    assert sorted(order.tolist()) == list(range(n))
    # small params are always full draws with the documented layouts
    nt = out["theta_mcmc"].shape[0] if n_chains == 1 else \
        out["theta_mcmc"].shape[-1]
    assert nt == 3 * q + (3 if q > 2 else 1) + q * (q - 1) // 2
    lead = (keep,) if n_chains == 1 else (keep, n_chains)
    if n_chains == 1:
        assert out["theta_mcmc"].shape == (nt, keep)
        assert out["tausq_mcmc"].shape == (q, keep)
    else:
        assert out["theta_mcmc"].shape == (keep, n_chains, nt)
        assert out["tausq_mcmc"].shape == (keep, n_chains, q)
    assert np.isfinite(out["theta_mcmc"]).all()
    assert np.isfinite(out["beta_mcmc"]).all()
    assert (np.asarray(out["tausq_mcmc"]) > 0).all()
    # big draws: full cubes in collect="all", moments (+ subsample) in summary
    if collect == "all":
        assert out["w_mcmc"].shape == lead + (n,)
        assert np.isfinite(out["w_mcmc"]).all()
        assert np.isfinite(out["yhat_mcmc"]).all()
    else:
        mshape = (n,) if n_chains == 1 else (n_chains, n)
        assert out["w_mean"].shape == mshape
        assert np.isfinite(out["w_mean"]).all()
        assert (out["w_var"] >= 0).all()
        sd = extra.get("summary_draws", 0)
        if sd:
            assert out["w_mcmc"].shape[0] > 0
            assert np.isfinite(out["w_mcmc"]).all()
    assert 0.0 <= out["accept_ratio"] <= 1.0
    assert out["mcmc_time"] > 0
