"""Post-fit prediction at NEW locations (spamtree_predict).

The reference can only predict at NA rows supplied to the original call;
spamtree_predict replays a finished fit's kept draws through the same
treed-DAG conditional at locations the fit never saw.  The gate: for the
SAME held-out locations, (a) the in-fit prediction path (rows passed as
NA) and (b) the post-fit path (rows withheld entirely, predicted after)
must produce the same posterior-predictive law -- means agree within the
Monte-Carlo envelope, and both beat the data scale on RMSPE.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spamtree_tpu import spamtree, spamtree_predict


def _sim(n=420, seed=5):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    C = np.exp(-7.0 * d)
    w = np.linalg.cholesky(C + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    X = rng.normal(size=(n, 2))
    beta = np.array([1.0, -0.5])
    y_full = X @ beta + w + 0.1 * rng.normal(size=n)
    held = rng.uniform(size=n) < 0.15
    return coords, X, y_full, held


MCMC = dict(keep=400, burn=300, thin=1)
KW = dict(cell_size=16, K=2, seed=9, dtype=jnp.float64)


def test_predict_new_matches_in_fit_prediction():
    coords, X, y_full, held = _sim()
    y_na = np.where(held, np.nan, y_full)

    # (a) reference path: held-out rows ride along as NA rows
    fit_a = spamtree(y_na, X, coords, mcmc=MCMC, **KW)
    pos_a = np.flatnonzero(held[fit_a["order"]])
    yhat_a = fit_a["yhat_mcmc"][:, pos_a]
    w_a = fit_a["w_mcmc"][:, pos_a]
    # map back to original held-row order
    orig_a = fit_a["order"][pos_a]

    # (b) post-fit path: fit never sees the held rows at all
    obs = ~held
    fit_b = spamtree(y_full[obs], X[obs], coords[obs], mcmc=MCMC, **KW)
    pred = spamtree_predict(
        fit_b, y_full[obs], X[obs], coords[obs],
        coords_new=coords[held], x_new=X[held], seed=3,
    )
    assert pred["w_pred"].shape == (MCMC["keep"], int(held.sum()))

    held_sorted = np.sort(np.flatnonzero(held))
    # yhat_a rows correspond to orig_a; reorder both to held_sorted order
    ya = yhat_a[:, np.argsort(orig_a)]
    wa = w_a[:, np.argsort(orig_a)]
    yb, wb = pred["yhat_pred"], pred["w_pred"]

    # posterior-predictive means agree within the joint MC envelope:
    # sd_of_mean ~ posterior sd / sqrt(ESS); use the empirical spread
    sd = np.sqrt(ya.var(0) / 40 + yb.var(0) / 40) + 0.05
    frac_off = np.mean(np.abs(ya.mean(0) - yb.mean(0)) > 4 * sd)
    assert frac_off < 0.08, (frac_off, np.abs(ya.mean(0) - yb.mean(0)).max())
    sdw = np.sqrt(wa.var(0) / 40 + wb.var(0) / 40) + 0.05
    assert np.mean(np.abs(wa.mean(0) - wb.mean(0)) > 4 * sdw) < 0.08

    # posterior-predictive spreads match too (same conditional law)
    r = np.median(yb.std(0) / np.maximum(ya.std(0), 1e-6))
    assert 0.6 < r < 1.6, r

    # both predict the truth far better than the data scale
    truth = y_full[held_sorted]
    rm_a = np.sqrt(np.mean((ya.mean(0) - truth) ** 2))
    rm_b = np.sqrt(np.mean((yb.mean(0) - truth) ** 2))
    sd_y = y_full.std()
    assert rm_a < 0.6 * sd_y and rm_b < 0.6 * sd_y
    assert abs(rm_a - rm_b) < 0.25 * sd_y


def test_predict_new_input_validation():
    coords, X, y_full, held = _sim(n=220)
    obs = ~held
    fit = spamtree(y_full[obs], X[obs], coords[obs],
                   mcmc=dict(keep=20, burn=20, thin=1), **KW)
    with pytest.raises(ValueError, match="x_new"):
        spamtree_predict(fit, y_full[obs], X[obs], coords[obs],
                         coords_new=coords[held], x_new=X[held][:, :1])
    with pytest.raises(ValueError, match="columns"):
        spamtree_predict(fit, y_full[obs], X[obs], coords[obs],
                         coords_new=coords[held][:, :1], x_new=X[held])
    with pytest.raises(ValueError, match="labels"):
        spamtree_predict(fit, y_full[obs], X[obs], coords[obs],
                         coords_new=coords[held], x_new=X[held],
                         mv_id_new=np.full(int(held.sum()), 7))
    # summary-mode fits hold no draws
    fs = spamtree(y_full[obs], X[obs], coords[obs],
                  mcmc=dict(keep=20, burn=20, thin=1),
                  settings=dict(collect="summary"), **KW)
    with pytest.raises(ValueError, match="draw"):
        spamtree_predict(fs, y_full[obs], X[obs], coords[obs],
                         coords_new=coords[held], x_new=X[held])


def test_predict_new_subsample_and_chunking():
    """n_draws subsampling + a chunk size that forces padding both work;
    draws are reproducible for a fixed seed."""
    coords, X, y_full, held = _sim(n=260, seed=8)
    obs = ~held
    fit = spamtree(y_full[obs], X[obs], coords[obs],
                   mcmc=dict(keep=60, burn=60, thin=1), **KW)
    args = (fit, y_full[obs], X[obs], coords[obs])
    kw = dict(coords_new=coords[held], x_new=X[held])
    p1 = spamtree_predict(*args, n_draws=25, chunk=7, seed=2, **kw)
    p2 = spamtree_predict(*args, n_draws=25, chunk=11, seed=2, **kw)
    assert p1["w_pred"].shape[0] == 25
    assert np.array_equal(p1["draw_indices"], p2["draw_indices"])
    # same draws, same per-draw keys -> identical w despite chunking
    np.testing.assert_allclose(p1["w_pred"], p2["w_pred"],
                               rtol=1e-10, atol=1e-12)


def test_predict_new_multichain_flatten():
    """A multi-chain fit's (keep, C, ...) draws fold into keep*C replay
    draws; outputs stay finite and shaped (S, m)."""
    coords, X, y_full, held = _sim(n=240, seed=12)
    obs = ~held
    fit = spamtree(y_full[obs], X[obs], coords[obs], n_chains=2,
                   mcmc=dict(keep=15, burn=15, thin=1), **KW)
    p = spamtree_predict(fit, y_full[obs], X[obs], coords[obs],
                         coords_new=coords[held], x_new=X[held],
                         n_draws=12, chunk=5)
    assert p["w_pred"].shape == (12, int(held.sum()))
    assert np.isfinite(p["yhat_pred"]).all()
    truth = y_full[held]
    rm = np.sqrt(np.mean((p["yhat_pred"].mean(0) - truth) ** 2))
    assert rm < 0.7 * y_full.std()


def test_predict_new_exact_conditional_single_block():
    """Analytic gate: with ONE reference block (last_not_reference=False,
    huge cell), a new location's treed conditional is the exact dense-GP
    per-location conditional N(Kxc' Kxx^-1 w, kii - Kxc' Kxx^-1 Kxc).
    Replaying one fixed (theta, w) draw many times must reproduce that
    mean and variance empirically -- this pins the tree rebuild, operator
    construction, and conditional draw end-to-end."""
    from spamtree_tpu.ops.covariance import pairwise_cov, unpack_theta
    from spamtree_tpu.model.params import make_theta_spec

    rng = np.random.default_rng(3)
    n, m, S = 40, 8, 600
    coords = rng.uniform(size=(n, 2))
    X = rng.normal(size=(n, 1))
    y = X[:, 0] + rng.normal(size=n)
    fit = spamtree(y, X, coords, mcmc=dict(keep=2, burn=10, thin=1),
                   cell_size=64 ** 2, last_not_reference=False, **{
                       k: v for k, v in KW.items() if k != "cell_size"})
    assert fit["tree"].n_blocks == 1  # the premise: a single reference block

    theta0 = np.asarray(fit["theta_mcmc"][:, -1])
    w0 = np.asarray(fit["w_mcmc"][-1])
    fake = dict(fit)
    fake["w_mcmc"] = np.tile(w0, (S, 1))
    fake["theta_mcmc"] = np.tile(theta0[:, None], (1, S))
    fake["beta_mcmc"] = np.tile(fit["beta_mcmc"][:, -1:, :], (1, S, 1))
    fake["tausq_mcmc"] = np.tile(fit["tausq_mcmc"][:, -1:], (1, S))

    cnew = rng.uniform(size=(m, 2))
    p = spamtree_predict(fake, y, X, coords, coords_new=cnew,
                         x_new=np.zeros((m, 1)), seed=5)

    # dense analytic conditional at theta0 (univariate exponential model)
    spec = make_theta_spec(2, 1).spec
    params = unpack_theta(jnp.asarray(theta0, dtype=jnp.float64), spec)
    cs = coords[fit["order"]]
    mv0 = np.zeros(n, dtype=np.int32)
    Kxx = np.asarray(pairwise_cov(jnp.asarray(cs), jnp.asarray(mv0),
                                  jnp.asarray(cs), jnp.asarray(mv0),
                                  params, spec))
    Kxc = np.asarray(pairwise_cov(jnp.asarray(cs), jnp.asarray(mv0),
                                  jnp.asarray(cnew), jnp.asarray(np.zeros(m, np.int32)),
                                  params, spec))
    kii = np.asarray(pairwise_cov(jnp.asarray(cnew), jnp.asarray(np.zeros(m, np.int32)),
                                  jnp.asarray(cnew), jnp.asarray(np.zeros(m, np.int32)),
                                  params, spec)).diagonal()
    A = np.linalg.solve(Kxx, Kxc)  # (n, m)
    mean_true = A.T @ w0
    var_true = kii - np.einsum("nm,nm->m", Kxc, A)

    emp_mean = p["w_pred"].mean(0)
    emp_var = p["w_pred"].var(0)
    se = np.sqrt(var_true / S)
    assert np.all(np.abs(emp_mean - mean_true) < 5 * se + 1e-8), (
        emp_mean, mean_true)
    np.testing.assert_allclose(emp_var, var_true, rtol=0.35, atol=1e-8)


def test_predict_new_bivariate_limited_tree():
    """Multivariate + limited-tree post-fit prediction: misaligned bivariate
    AG10 data with NON-contiguous mv labels (3, 7), fit with limited_tree=
    True.  Gate: the post-fit path at held-out locations agrees with the
    in-fit NA-row prediction law at the same locations (means within the
    joint MC envelope) and beats the data scale -- pins the mv-label
    mapping and the limited-tree rebuild inside spamtree_predict."""
    from test_covariance import np_ag10

    rng = np.random.default_rng(21)
    n0, n1 = 210, 190
    coords = np.vstack([rng.uniform(size=(n0, 2)), rng.uniform(size=(n1, 2))])
    mv0 = np.concatenate([np.zeros(n0, np.int64), np.ones(n1, np.int64)])
    n = n0 + n1
    ai1, ai2 = np.array([1.2, 0.9]), np.array([0.4, 0.5])
    phi_i, c, d = np.array([5.0, 7.0]), 5.0, 1.0
    Dmat = np.array([[0.0, d], [d, 0.0]])
    CC = np_ag10(coords, mv0, coords, mv0, ai1, ai2, phi_i, np.array([c]),
                 Dmat)
    w_true = np.linalg.cholesky(CC + 1e-9 * np.eye(n)) @ rng.normal(size=n)
    beta_true = np.array([[1.0, -0.4], [-0.5, 0.8]])  # (p, q)
    X = rng.normal(size=(n, 2))
    tausq = np.array([0.09, 0.16])
    y_full = (np.sum(X * beta_true[:, mv0].T, axis=1) + w_true
              + np.sqrt(tausq[mv0]) * rng.normal(size=n))
    mv = np.where(mv0 == 0, 3, 7)  # labels need not be 0..q-1
    held = rng.uniform(size=n) < 0.12

    kw = dict(cell_size=16, K=2, seed=6, dtype=jnp.float64,
              limited_tree=True, mv_id=None)
    mcmc = dict(keep=300, burn=250, thin=1)

    # (a) in-fit path: held rows ride along as NA
    y_na = np.where(held, np.nan, y_full)
    fa = spamtree(y_na, X, coords, mcmc=mcmc, **dict(kw, mv_id=mv))
    pos = np.flatnonzero(held[fa["order"]])
    ya = fa["yhat_mcmc"][:, pos][:, np.argsort(fa["order"][pos])]

    # (b) post-fit path: held rows withheld entirely
    obs = ~held
    fb = spamtree(y_full[obs], X[obs], coords[obs], mcmc=mcmc,
                  **dict(kw, mv_id=mv[obs]))
    pred = spamtree_predict(
        fb, y_full[obs], X[obs], coords[obs], coords_new=coords[held],
        x_new=X[held], mv_id=mv[obs], mv_id_new=mv[held], seed=2,
    )
    yb = pred["yhat_pred"]
    assert yb.shape == (mcmc["keep"], int(held.sum()))

    sd = np.sqrt(ya.var(0) / 30 + yb.var(0) / 30) + 0.05
    frac_off = np.mean(np.abs(ya.mean(0) - yb.mean(0)) > 4 * sd)
    assert frac_off < 0.1, (frac_off,)

    truth = y_full[np.sort(np.flatnonzero(held))]
    sd_y = y_full.std()
    rm_a = np.sqrt(np.mean((ya.mean(0) - truth) ** 2))
    rm_b = np.sqrt(np.mean((yb.mean(0) - truth) ** 2))
    assert rm_a < 0.7 * sd_y and rm_b < 0.7 * sd_y, (rm_a, rm_b, sd_y)
    assert abs(rm_a - rm_b) < 0.3 * sd_y
