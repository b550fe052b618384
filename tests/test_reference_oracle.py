"""Chain-level parity against a dense NumPy oracle of the REFERENCE sampler.

SURVEY.md section 4 names "RMSPE + posterior-mean parity vs the Rcpp
reference" as the natural end-to-end gate.  R is not available here, so
``tests/_oracle_numpy.py`` implements the reference sampler's semantics
(same conditionals, same leaf->root update order, same child-message timing,
RAM-MH with jacobian and chol auto-reject; sources cited there) directly in
dense NumPy -- and this test runs BOTH samplers on the same data + tree and
asserts the posteriors agree within Monte-Carlo error.

This is the one test where agreement cannot come from shared code: the
oracle is per-block dense ``np.linalg`` with message dictionaries; the JAX
sampler is padded level batches with propagated joint factors.
"""

import numpy as np
import jax.numpy as jnp

from spamtree_tpu import spamtree
from spamtree_tpu.tree.partition import make_tree

from _oracle_numpy import DenseOracle


def _batch_se(x, lag=60):
    """Batch-means standard error of the mean for an autocorrelated chain."""
    x = np.asarray(x, dtype=np.float64)
    nb = len(x) // lag
    bm = x[: nb * lag].reshape(nb, lag).mean(axis=1)
    return float(bm.std(ddof=1) / np.sqrt(nb))


def test_posterior_parity_vs_dense_oracle():
    rng = np.random.default_rng(42)
    n = 250
    coords = rng.uniform(size=(n, 2))
    # pre-sort so row order is identical in both samplers (the API sorts
    # internally with the same lexsort; on sorted input it is the identity)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    sigma2, phi, tausq = 1.5, 5.0, 0.1
    D = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    CC = sigma2 * np.exp(-phi * D)
    w_true = np.linalg.cholesky(CC + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    beta_true = np.array([1.0, -0.5])
    X = rng.normal(size=(n, 2))
    y_full = X @ beta_true + w_true + np.sqrt(tausq) * rng.normal(size=n)
    y = y_full.copy()
    miss = np.zeros(n, dtype=bool)
    miss[rng.choice(n, size=25, replace=False)] = True
    y[miss] = np.nan

    seed = 3
    keep, burn = 1500, 700
    th0 = np.array([1.0, 1.0, 1.0, 4.0])
    toplim = 30.0
    tausq_ab = (2.01, 1.0)
    beta_Vi = 0.01

    # identical tree for both: replicate the API's internal construction
    tree = make_tree(
        coords, np.isfinite(y), np.zeros(n, dtype=np.int64),
        axis_cell_size=int(round(25 ** 0.5)), K=2,
        rng=np.random.default_rng(seed),
    )

    bounds = np.zeros((4, 2))
    bounds[:, 0] = 1e-3
    bounds[:, 1] = toplim

    oracle = DenseOracle(
        tree, coords, y, X, bounds, th0, start_tausq=0.1,
        beta_Vi=beta_Vi, tausq_ab=tausq_ab, mcmcsd=0.05, seed=seed,
    )
    oc = oracle.run(keep=keep, burn=burn)
    assert 0.05 < oracle.accept_count / oracle.propos_count < 0.7

    out = spamtree(
        y, X, coords, cell_size=25,
        mcmc=dict(keep=keep, burn=burn, thin=1),
        prior=dict(toplim=toplim, tausq=tausq_ab, beta=beta_Vi),
        starting=dict(theta=th0, tausq=0.1),
        dtype=jnp.float64, seed=seed,
    )
    assert np.array_equal(out["order"], np.arange(n))
    assert 0.05 < out["accept_ratio"] < 0.7

    # --- beta and tausq: means within 5 combined batch-mean SEs
    for j in range(2):
        a = out["beta_mcmc"][j, :, 0]
        b = oc["beta"][:, j, 0]
        se = np.hypot(_batch_se(a), _batch_se(b))
        assert abs(a.mean() - b.mean()) < 5 * se, (
            f"beta[{j}]: {a.mean():.4f} vs {b.mean():.4f}, se={se:.4f}"
        )
    a, b = out["tausq_mcmc"][0], oc["tausq"][:, 0]
    se = np.hypot(_batch_se(a), _batch_se(b))
    assert abs(a.mean() - b.mean()) < 5 * se, (a.mean(), b.mean(), se)

    # --- latent field: posterior means agree pointwise within MC error
    w_a = out["w_mcmc"].mean(axis=0)
    w_b = oc["w"].mean(axis=0)
    sd_b = oc["w"].std(axis=0)
    z = np.abs(w_a - w_b) / np.maximum(sd_b, 1e-3)
    assert z.mean() < 0.35, z.mean()
    assert np.corrcoef(w_a, w_b)[0, 1] > 0.99

    # --- identified theta dims (sigma2 = theta0, phi = theta3)
    for j in (0, 3):
        a = out["theta_mcmc"][j]
        b = oc["theta"][:, j]
        se = np.hypot(_batch_se(a, lag=100), _batch_se(b, lag=100))
        diff = abs(a.mean() - b.mean())
        assert diff < max(5 * se, 0.25 * b.mean()), (
            f"theta[{j}]: {a.mean():.3f} vs {b.mean():.3f}, se={se:.3f}"
        )

    # --- RMSPE at the held-out rows (the reference's headline metric)
    yhat_a = out["yhat_mcmc"].mean(axis=0)
    yhat_b = oc["yhat"].mean(axis=0)
    rmspe_a = float(np.sqrt(np.mean((yhat_a[miss] - y_full[miss]) ** 2)))
    rmspe_b = float(np.sqrt(np.mean((yhat_b[miss] - y_full[miss]) ** 2)))
    assert abs(rmspe_a - rmspe_b) / rmspe_b < 0.10, (rmspe_a, rmspe_b)
    # and both beat the no-model baseline by a wide margin
    sd_y = float(np.std(y_full[miss]))
    assert rmspe_a < 0.7 * sd_y and rmspe_b < 0.7 * sd_y


def test_posterior_parity_vs_dense_oracle_bivariate():
    """The multivariate path against the same dense reference-semantics
    oracle: misaligned bivariate AG10 data (margins observed at different
    locations, the vignette setting), per-outcome beta/tausq conjugates,
    8-dim theta (ai1, ai2, phi_i, c, latent D) through the RAM-MH step.
    The oracle's vectorized AG10 covariance is first cross-checked against
    the per-pair np_ag10 implementation written independently from the
    formulas (test_covariance.py)."""
    from test_covariance import np_ag10

    rng = np.random.default_rng(11)
    n0, n1 = 130, 110
    coords = np.vstack([rng.uniform(size=(n0, 2)), rng.uniform(size=(n1, 2))])
    mv = np.concatenate([np.zeros(n0, np.int64), np.ones(n1, np.int64)])
    n = n0 + n1
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]

    # truth: AG10 eq.(7) with the reference's theta layout for q=2
    ai1, ai2 = np.array([1.2, 0.9]), np.array([0.4, 0.5])
    phi_i, c, d = np.array([4.0, 6.0]), 5.0, 1.0
    th_true = np.concatenate([ai1, ai2, phi_i, [c], [d]])
    Dmat = np.array([[0.0, d], [d, 0.0]])
    CC = np_ag10(coords, mv, coords, mv, ai1, ai2, phi_i, np.array([c]),
                 Dmat)
    w_true = np.linalg.cholesky(CC + 1e-9 * np.eye(n)) @ rng.normal(size=n)
    beta_true = np.array([[1.0, -0.4], [-0.5, 0.8]])  # (p, q)
    X = rng.normal(size=(n, 2))
    tausq = np.array([0.09, 0.16])
    y_full = (np.sum(X * beta_true[:, mv].T, axis=1) + w_true
              + np.sqrt(tausq[mv]) * rng.normal(size=n))
    y = y_full.copy()
    miss = np.zeros(n, dtype=bool)
    miss[rng.choice(n, size=24, replace=False)] = True
    y[miss] = np.nan

    seed = 5
    keep, burn = 1200, 600
    btmlim, toplim = 1e-3, 30.0
    # reference bounds layout for q=2 (R/spamtree_fit.R:84-157): all
    # [btmlim, toplim], ai1[1] lower bound -toplim, latent D upper
    # vlim - btmlim
    bounds = np.zeros((8, 2))
    bounds[:, 0] = btmlim
    bounds[:, 1] = toplim
    bounds[1, 0] = -toplim
    bounds[7, 1] = toplim - btmlim
    th0 = np.clip(np.ones(8), bounds[:, 0] + 1e-6, bounds[:, 1] - 1e-6)
    from spamtree_tpu.model.params import make_theta_spec
    ts = make_theta_spec(2, 2, btmlim=btmlim, toplim=toplim)
    np.testing.assert_allclose(ts.bounds, bounds)

    tree = make_tree(
        coords, np.isfinite(y), mv,
        axis_cell_size=int(round(25 ** 0.5)), K=2,
        rng=np.random.default_rng(seed),
    )
    oracle = DenseOracle(
        tree, coords, y, X, bounds, th0, start_tausq=0.1,
        beta_Vi=0.01, tausq_ab=(2.01, 1.0), mcmcsd=0.02, seed=seed,
        mv_id=mv, q=2,
    )
    # vectorized oracle covariance == independent per-pair implementation
    np.testing.assert_allclose(oracle._cov(th_true), CC, rtol=1e-12,
                               atol=1e-14)
    oc = oracle.run(keep=keep, burn=burn)
    assert 0.05 < oracle.accept_count / oracle.propos_count < 0.7

    out = spamtree(
        y, X, coords, mv_id=mv, cell_size=25,
        mcmc=dict(keep=keep, burn=burn, thin=1),
        prior=dict(btmlim=btmlim, toplim=toplim, tausq=(2.01, 1.0),
                   beta=0.01),
        starting=dict(theta=th0, tausq=0.1),
        settings=dict(mcmcsd=0.02, curvature_sd=False),
        dtype=jnp.float64, seed=seed,
    )
    assert np.array_equal(out["order"], np.arange(n))
    assert 0.05 < out["accept_ratio"] < 0.7

    # --- per-outcome beta and tausq means within 5 combined batch SEs
    for j in range(2):
        for k in range(2):
            a = out["beta_mcmc"][k, :, j]
            b = oc["beta"][:, k, j]
            se = np.hypot(_batch_se(a), _batch_se(b))
            assert abs(a.mean() - b.mean()) < 5 * se, (
                f"beta[{k},{j}]: {a.mean():.4f} vs {b.mean():.4f}, "
                f"se={se:.4f}"
            )
        a, b = out["tausq_mcmc"][j], oc["tausq"][:, j]
        se = np.hypot(_batch_se(a), _batch_se(b))
        assert abs(a.mean() - b.mean()) < 5 * se, (j, a.mean(), b.mean(), se)

    # --- latent field parity
    w_a = out["w_mcmc"].mean(axis=0)
    w_b = oc["w"].mean(axis=0)
    sd_b = oc["w"].std(axis=0)
    z = np.abs(w_a - w_b) / np.maximum(sd_b, 1e-3)
    assert z.mean() < 0.35, z.mean()
    assert np.corrcoef(w_a, w_b)[0, 1] > 0.99

    # --- RMSPE parity at held-out rows
    yhat_a = out["yhat_mcmc"].mean(axis=0)
    yhat_b = oc["yhat"].mean(axis=0)
    rmspe_a = float(np.sqrt(np.mean((yhat_a[miss] - y_full[miss]) ** 2)))
    rmspe_b = float(np.sqrt(np.mean((yhat_b[miss] - y_full[miss]) ** 2)))
    assert abs(rmspe_a - rmspe_b) / rmspe_b < 0.10, (rmspe_a, rmspe_b)
    sd_y = float(np.std(y_full[miss]))
    assert rmspe_a < 0.8 * sd_y and rmspe_b < 0.8 * sd_y


def test_posterior_parity_q3_fixed_theta():
    """q = 3 engages the other covariance branch (n_cbase = 3: psi-scaled
    Gneiting base with thetamv = (a, b, c)) and a 3-outcome conjugate
    cycle.  theta is FIXED at the truth in both samplers (debug
    sample_theta=False; 15-dim RAM mixing would dominate the MC error), so
    this pins the q = 3 likelihood factors, w-Gibbs, prediction, and
    per-outcome beta/tausq against the dense oracle exactly at the same
    covariance."""
    from test_covariance import np_ag10

    rng = np.random.default_rng(7)
    counts = (110, 80, 60)
    coords = np.vstack([rng.uniform(size=(c, 2)) for c in counts])
    mv = np.concatenate([np.full(c, j, np.int64)
                         for j, c in enumerate(counts)])
    n = len(mv)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]

    q = 3
    ai1 = np.array([1.1, 0.9, 1.3])
    ai2 = np.array([0.4, 0.3, 0.5])
    phi_i = np.array([4.0, 6.0, 5.0])
    thetamv = np.array([0.8, 0.6, 5.0])  # (a, b in (0,1), c)
    dvec = np.array([0.8, 1.2, 0.6])  # D lower-tri column-major
    th_true = np.concatenate([ai1, ai2, phi_i, thetamv, dvec])
    Dmat = np.zeros((q, q))
    Dmat[1, 0] = Dmat[0, 1] = dvec[0]
    Dmat[2, 0] = Dmat[0, 2] = dvec[1]
    Dmat[2, 1] = Dmat[1, 2] = dvec[2]
    CC = np_ag10(coords, mv, coords, mv, ai1, ai2, phi_i, thetamv, Dmat)
    w_true = np.linalg.cholesky(CC + 1e-9 * np.eye(n)) @ rng.normal(size=n)
    beta_true = np.array([[1.0, -0.4, 0.6], [-0.5, 0.8, -0.2]])
    X = rng.normal(size=(n, 2))
    tausq = np.array([0.09, 0.16, 0.04])
    y_full = (np.sum(X * beta_true[:, mv].T, axis=1) + w_true
              + np.sqrt(tausq[mv]) * rng.normal(size=n))
    y = y_full.copy()
    miss = np.zeros(n, dtype=bool)
    miss[rng.choice(n, size=25, replace=False)] = True
    y[miss] = np.nan

    seed = 9
    keep, burn = 1000, 400
    bounds = np.zeros((15, 2))  # box only used for clipping; theta fixed
    bounds[:, 0] = 1e-3
    bounds[:, 1] = 30.0
    bounds[1:q, 0] = -30.0
    bounds[10, :] = (1e-3, 1.0 - 1e-3)  # b = beta_psi1 in (0, 1)

    tree = make_tree(
        coords, np.isfinite(y), mv,
        axis_cell_size=int(round(25 ** 0.5)), K=2,
        rng=np.random.default_rng(seed),
    )
    oracle = DenseOracle(
        tree, coords, y, X, bounds, th_true, start_tausq=0.1,
        beta_Vi=0.01, tausq_ab=(2.01, 1.0), mcmcsd=0.02, seed=seed,
        mv_id=mv, q=q,
    )
    np.testing.assert_allclose(oracle._cov(th_true), CC, rtol=1e-12,
                               atol=1e-14)
    oc = oracle.run(keep=keep, burn=burn, sample_theta=False)

    out = spamtree(
        y, X, coords, mv_id=mv, cell_size=25,
        mcmc=dict(keep=keep, burn=burn, thin=1),
        prior=dict(set_unif_bounds=bounds, tausq=(2.01, 1.0), beta=0.01),
        starting=dict(theta=th_true, tausq=0.1),
        debug=dict(sample_theta=False),
        dtype=jnp.float64, seed=seed,
    )
    assert np.array_equal(out["order"], np.arange(n))

    for j in range(q):
        for k in range(2):
            a = out["beta_mcmc"][k, :, j]
            b = oc["beta"][:, k, j]
            se = np.hypot(_batch_se(a), _batch_se(b))
            assert abs(a.mean() - b.mean()) < 5 * se, (
                f"beta[{k},{j}]: {a.mean():.4f} vs {b.mean():.4f}, "
                f"se={se:.4f}"
            )
        a, b = out["tausq_mcmc"][j], oc["tausq"][:, j]
        se = np.hypot(_batch_se(a), _batch_se(b))
        assert abs(a.mean() - b.mean()) < 5 * se, (j, a.mean(), b.mean(), se)

    w_a = out["w_mcmc"].mean(axis=0)
    w_b = oc["w"].mean(axis=0)
    sd_b = oc["w"].std(axis=0)
    z = np.abs(w_a - w_b) / np.maximum(sd_b, 1e-3)
    assert z.mean() < 0.35, z.mean()
    assert np.corrcoef(w_a, w_b)[0, 1] > 0.99

    yhat_a = out["yhat_mcmc"].mean(axis=0)
    yhat_b = oc["yhat"].mean(axis=0)
    rmspe_a = float(np.sqrt(np.mean((yhat_a[miss] - y_full[miss]) ** 2)))
    rmspe_b = float(np.sqrt(np.mean((yhat_b[miss] - y_full[miss]) ** 2)))
    assert abs(rmspe_a - rmspe_b) / rmspe_b < 0.10, (rmspe_a, rmspe_b)


def test_posterior_parity_limited_tree():
    """limited_tree=True (single nearest-reference-ancestor parents, the
    reference's make_edges_limited mode and the intended big-n
    configuration) through the same chain-level oracle gate: the oracle
    reads tree.parents directly, so the only thing shared with the JAX
    sampler is the tree itself."""
    rng = np.random.default_rng(21)
    n = 240
    coords = rng.uniform(size=(n, 2))
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    sigma2, phi, tausq = 1.5, 5.0, 0.1
    D = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    CC = sigma2 * np.exp(-phi * D)
    w_true = np.linalg.cholesky(CC + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    beta_true = np.array([1.0, -0.5])
    X = rng.normal(size=(n, 2))
    y_full = X @ beta_true + w_true + np.sqrt(tausq) * rng.normal(size=n)
    y = y_full.copy()
    miss = np.zeros(n, dtype=bool)
    miss[rng.choice(n, size=24, replace=False)] = True
    y[miss] = np.nan

    seed = 13
    keep, burn = 1200, 600
    th0 = np.array([1.0, 1.0, 1.0, 4.0])
    bounds = np.zeros((4, 2))
    bounds[:, 0] = 1e-3
    bounds[:, 1] = 30.0

    tree = make_tree(
        coords, np.isfinite(y), np.zeros(n, dtype=np.int64),
        axis_cell_size=int(round(25 ** 0.5)), K=2,
        rng=np.random.default_rng(seed), limited_tree=True,
    )
    assert all(len(p) <= 1 for p in tree.parents)
    oracle = DenseOracle(
        tree, coords, y, X, bounds, th0, start_tausq=0.1,
        beta_Vi=0.01, tausq_ab=(2.01, 1.0), mcmcsd=0.05, seed=seed,
    )
    oc = oracle.run(keep=keep, burn=burn)
    assert 0.05 < oracle.accept_count / oracle.propos_count < 0.7

    out = spamtree(
        y, X, coords, cell_size=25, limited_tree=True,
        mcmc=dict(keep=keep, burn=burn, thin=1),
        prior=dict(toplim=30.0, tausq=(2.01, 1.0), beta=0.01),
        starting=dict(theta=th0, tausq=0.1),
        dtype=jnp.float64, seed=seed,
    )
    assert np.array_equal(out["order"], np.arange(n))
    assert 0.05 < out["accept_ratio"] < 0.7

    for j in range(2):
        a = out["beta_mcmc"][j, :, 0]
        b = oc["beta"][:, j, 0]
        se = np.hypot(_batch_se(a), _batch_se(b))
        assert abs(a.mean() - b.mean()) < 5 * se, (j, a.mean(), b.mean(), se)
    a, b = out["tausq_mcmc"][0], oc["tausq"][:, 0]
    se = np.hypot(_batch_se(a), _batch_se(b))
    assert abs(a.mean() - b.mean()) < 5 * se, (a.mean(), b.mean(), se)

    w_a = out["w_mcmc"].mean(axis=0)
    w_b = oc["w"].mean(axis=0)
    z = np.abs(w_a - w_b) / np.maximum(oc["w"].std(axis=0), 1e-3)
    assert z.mean() < 0.35, z.mean()
    assert np.corrcoef(w_a, w_b)[0, 1] > 0.99

    yhat_a = out["yhat_mcmc"].mean(axis=0)
    yhat_b = oc["yhat"].mean(axis=0)
    rmspe_a = float(np.sqrt(np.mean((yhat_a[miss] - y_full[miss]) ** 2)))
    rmspe_b = float(np.sqrt(np.mean((yhat_b[miss] - y_full[miss]) ** 2)))
    assert abs(rmspe_a - rmspe_b) / rmspe_b < 0.10, (rmspe_a, rmspe_b)


def test_posterior_parity_aligned_scale_fixed_theta():
    """Chain-level oracle parity at a scale where the PARENT-ALIGNED thin
    and prediction layouts actually activate (align_min_p=128 requires the
    leftover level's propagated parent dimension P >= 128; at the other
    oracle tests' n<=250 the aligned path never runs, so the layouts that
    carry the n=1e5 benchmark were exactness-tested but never chain-level
    validated).  n=2500 at cell_size=49 gives P=147 at the thin leftover
    level and the all-missing prediction level -- both aligned.

    theta is FIXED at a known value in both samplers (a dense oracle
    theta-eval is O(n^3); fixed theta needs one factorization), so this
    pins the aligned-layout likelihood factors, w-Gibbs message timing,
    prediction operators, and conjugate beta/tausq at chain level.
    Reference semantics bar: predict/w updates at spamtree_model.cpp
    1011-1358."""
    rng = np.random.default_rng(33)
    n = 2500
    coords = rng.uniform(size=(n, 2))
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    sigma2, phi, tausq = 1.5, 5.0, 0.1
    D = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    CC = sigma2 * np.exp(-phi * D)
    w_true = np.linalg.cholesky(CC + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    beta_true = np.array([1.0, -0.5])
    X = rng.normal(size=(n, 2))
    y_full = X @ beta_true + w_true + np.sqrt(tausq) * rng.normal(size=n)
    y = y_full.copy()
    miss = np.zeros(n, dtype=bool)
    miss[rng.choice(n, size=200, replace=False)] = True
    y[miss] = np.nan

    seed = 17
    keep, burn = 700, 300
    th_fix = np.array([1.4, 1.0, 1.0, 5.2])
    bounds = np.zeros((4, 2))
    bounds[:, 0] = 1e-3
    bounds[:, 1] = 30.0

    tree = make_tree(
        coords, np.isfinite(y), np.zeros(n, dtype=np.int64),
        axis_cell_size=int(round(49 ** 0.5)), K=2,
        rng=np.random.default_rng(seed),
    )
    # the point of this test: the aligned layouts must actually be active
    from spamtree_tpu.model.core import ModelStatic
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.schedule import build_schedule
    sched = build_schedule(tree)
    ts = make_theta_spec(2, 1)
    ms_probe = ModelStatic(sched, coords, np.zeros(n, np.int64), y, X,
                           ts.spec, dtype=jnp.float64)
    assert any(ms_probe.level_aligned), "thin-level alignment did not activate"
    assert any(ms_probe.pred_aligned), "pred alignment did not activate"

    oracle = DenseOracle(
        tree, coords, y, X, bounds, th_fix, start_tausq=0.1,
        beta_Vi=0.01, tausq_ab=(2.01, 1.0), mcmcsd=0.05, seed=seed,
    )
    oc = oracle.run(keep=keep, burn=burn, sample_theta=False)

    out = spamtree(
        y, X, coords, cell_size=49,
        mcmc=dict(keep=keep, burn=burn, thin=1),
        prior=dict(toplim=30.0, tausq=(2.01, 1.0), beta=0.01),
        starting=dict(theta=th_fix, tausq=0.1),
        debug=dict(sample_theta=False),
        dtype=jnp.float64, seed=seed,
    )
    assert np.array_equal(out["order"], np.arange(n))

    for j in range(2):
        a = out["beta_mcmc"][j, :, 0]
        b = oc["beta"][:, j, 0]
        se = np.hypot(_batch_se(a), _batch_se(b))
        assert abs(a.mean() - b.mean()) < 5 * se, (j, a.mean(), b.mean(), se)
    a, b = out["tausq_mcmc"][0], oc["tausq"][:, 0]
    se = np.hypot(_batch_se(a), _batch_se(b))
    assert abs(a.mean() - b.mean()) < 5 * se, (a.mean(), b.mean(), se)

    w_a = out["w_mcmc"].mean(axis=0)
    w_b = oc["w"].mean(axis=0)
    sd_b = oc["w"].std(axis=0)
    z = np.abs(w_a - w_b) / np.maximum(sd_b, 1e-3)
    assert z.mean() < 0.35, z.mean()
    assert np.corrcoef(w_a, w_b)[0, 1] > 0.99

    yhat_a = out["yhat_mcmc"].mean(axis=0)
    yhat_b = oc["yhat"].mean(axis=0)
    rmspe_a = float(np.sqrt(np.mean((yhat_a[miss] - y_full[miss]) ** 2)))
    rmspe_b = float(np.sqrt(np.mean((yhat_b[miss] - y_full[miss]) ** 2)))
    assert abs(rmspe_a - rmspe_b) / rmspe_b < 0.10, (rmspe_a, rmspe_b)
    sd_y = float(np.std(y_full[miss]))
    assert rmspe_a < 0.7 * sd_y and rmspe_b < 0.7 * sd_y
