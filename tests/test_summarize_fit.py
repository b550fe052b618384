"""summarize_fit: one-call posterior report over every fit layout.

The reference exports only the raw ingredients (list_mean/list_qtile,
src/list_mean.cpp) and leaves report assembly to the user.  Gates here:
exact moments/quantiles on synthetic fits in all three layouts
(single-chain, multi-chain, summary-collection), and a smoke pass over a
real tiny fit.
"""

import numpy as np
import jax.numpy as jnp

from spamtree_tpu import spamtree, summarize_fit


def test_summarize_single_chain_exact():
    rng = np.random.default_rng(0)
    keep, p, q, nt, n = 40, 2, 2, 5, 30
    beta = rng.normal(size=(p, keep, q))        # reference layout
    tausq = rng.uniform(0.5, 1.0, size=(q, keep))
    theta = rng.normal(size=(nt, keep))
    w = rng.normal(size=(keep, n))
    fit = dict(n_chains=1, accept_ratio=0.3, beta_mcmc=beta,
               tausq_mcmc=tausq, theta_mcmc=theta, w_mcmc=w,
               yhat_mcmc=w + 1.0)
    s = summarize_fit(fit, probs=(0.1, 0.9))
    np.testing.assert_allclose(s["beta"]["mean"], beta.mean(axis=1))
    np.testing.assert_allclose(s["tausq"]["sd"], tausq.std(axis=1, ddof=1))
    np.testing.assert_allclose(s["theta"]["q"][0.9],
                               np.quantile(theta, 0.9, axis=1))
    np.testing.assert_allclose(s["w"]["mean"], w.mean(axis=0))
    np.testing.assert_allclose(s["yhat"]["mean"], w.mean(axis=0) + 1.0)
    assert s["n_draws"] == keep and s["n_chains"] == 1
    assert "rhat" not in s["theta"]  # single chain: no between-chain diag


def test_summarize_multichain_folds_chains():
    rng = np.random.default_rng(1)
    keep, C, nt = 30, 4, 3
    theta = rng.normal(size=(keep, C, nt))
    fit = dict(n_chains=C, accept_ratio=0.25, theta_mcmc=theta,
               beta_mcmc=rng.normal(size=(keep, C, 2, 1)),
               tausq_mcmc=rng.uniform(size=(keep, C, 1)),
               w_mcmc=rng.normal(size=(keep, C, 12)),
               yhat_mcmc=rng.normal(size=(keep, C, 12)))
    s = summarize_fit(fit)
    flat = theta.reshape(-1, nt)
    np.testing.assert_allclose(s["theta"]["mean"], flat.mean(axis=0))
    np.testing.assert_allclose(s["theta"]["q"][0.5],
                               np.quantile(flat, 0.5, axis=0))
    assert s["theta"]["rhat"].shape == (nt,)
    # iid draws across chains: rhat ~ 1
    assert np.all(s["theta"]["rhat"] < 1.2)
    assert s["n_draws"] == keep * C
    assert s["w"]["mean"].shape == (12,)


def test_summarize_summary_collection_mode():
    rng = np.random.default_rng(2)
    n = 20
    fit = dict(n_chains=1, accept_ratio=0.3,
               beta_mcmc=rng.normal(size=(1, 25, 1)),
               tausq_mcmc=rng.uniform(size=(1, 25)),
               theta_mcmc=rng.normal(size=(4, 25)),
               w_mcmc=np.zeros((0, n)), yhat_mcmc=np.zeros((0, n)),
               w_mean=rng.normal(size=n), w_var=rng.uniform(size=n),
               yhat_mean=rng.normal(size=n), yhat_var=rng.uniform(size=n),
               summary_count=np.asarray(25))
    s = summarize_fit(fit)
    np.testing.assert_allclose(s["w"]["mean"], fit["w_mean"])
    np.testing.assert_allclose(s["w"]["sd"], np.sqrt(fit["w_var"]))
    assert "q" not in s["w"]  # no draws -> no quantiles
    assert s["n_draws"] == 25


def test_summarize_real_fit_smoke():
    rng = np.random.default_rng(5)
    n = 220
    coords = rng.uniform(size=(n, 2))
    X = rng.normal(size=(n, 1))
    y = X[:, 0] + np.sin(4 * coords[:, 0]) + 0.1 * rng.normal(size=n)
    fit = spamtree(y, X, coords, mcmc=dict(keep=25, burn=25, thin=1),
                   cell_size=16, seed=3, dtype=jnp.float64)
    s = summarize_fit(fit)
    assert s["beta"]["mean"].shape == (1, 1)
    assert s["w"]["mean"].shape == (n,)
    for tab in ("beta", "tausq", "theta", "w", "yhat"):
        assert np.isfinite(s[tab]["mean"]).all(), tab
        assert np.isfinite(s[tab]["sd"]).all(), tab
