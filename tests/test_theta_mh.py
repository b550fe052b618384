"""MH-on-theta correctness: with the latent field fixed at a draw from the
prior (debug: sample_w=False), the theta chain should concentrate near the
generating parameters -- an end-to-end test of the likelihood sweep + RAM
adaptive Metropolis + logit transforms (reference machinery at
spamtree_fit.cpp:203-289, mh_adapt.h)."""

import numpy as np
import jax.numpy as jnp

from spamtree_tpu import spamtree


def test_theta_recovers_univariate():
    rng = np.random.default_rng(11)
    n = 400
    coords = rng.uniform(size=(n, 2))
    sigmasq, phi = 2.0, 8.0
    D = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    CC = sigmasq * np.exp(-phi * D)
    w = np.linalg.cholesky(CC + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    tausq = 0.05
    y = w + np.sqrt(tausq) * rng.normal(size=n)
    X = np.zeros((n, 1))

    out = spamtree(
        y, X, coords, cell_size=25,
        mcmc=dict(keep=250, burn=250, thin=1),
        starting=dict(w=w),
        debug=dict(sample_beta=False, sample_tausq=True, sample_theta=True,
                   sample_w=False, sample_predicts=False),
        prior=dict(toplim=50.0),  # keep the box informative for a short chain
        dtype=jnp.float64, seed=5,
    )
    th = out["theta_mcmc"][:, 100:]  # (4, keep-100)
    sig_hat = th[0].mean()  # ai1 = sigmasq in the univariate fast path
    phi_hat = th[3].mean()  # thetamv[0] = phi
    assert 0.5 * sigmasq < sig_hat < 2.5 * sigmasq, sig_hat
    assert 0.5 * phi < phi_hat < 2.0 * phi, phi_hat
    # tausq Gibbs sees w exactly -> should nail the nugget
    tq = out["tausq_mcmc"][:, 100:].mean()
    assert 0.5 * tausq < tq < 2.0 * tausq, tq
    assert 0.05 < out["accept_ratio"] < 0.6


def test_informative_theta_prior_via_api():
    """prior=dict(theta=[...]) through the PUBLIC front-end: a tight
    lognormal prior must dominate a weakly-informative likelihood and pull
    the theta posterior to the prior mode (the reference computes
    calc_prior_logratio but never adds it, spamtree_fit.cpp:239-246 -- this
    is a documented extension, model/priors.py)."""
    import numpy as np
    import jax.numpy as jnp

    from spamtree_tpu import spamtree

    rng = np.random.default_rng(17)
    n = 150
    coords = rng.uniform(size=(n, 2))
    X = rng.normal(size=(n, 1))
    y = X[:, 0] + 0.5 * rng.normal(size=n)  # barely spatial: weak likelihood
    target = 2.0
    nt = 4  # q=1 AG10: (sigma2, ., ., phi)
    tight = [("lognormal", float(np.log(target)), 0.05)] * nt
    out = spamtree(
        y, X, coords, cell_size=16, K=2,
        mcmc=dict(keep=300, burn=300),
        prior=dict(theta=tight, toplim=30.0),
        starting=dict(theta=np.full(nt, 1.0)),
        dtype=jnp.float64, seed=3,
    )
    th = out["theta_mcmc"]  # (nt, keep)
    means = th.mean(axis=1)
    # every dim concentrates near the prior mode (sigma 0.05 in log space;
    # allow generous slack for likelihood pull + MC error)
    assert np.all(np.abs(np.log(means) - np.log(target)) < 0.35), means
