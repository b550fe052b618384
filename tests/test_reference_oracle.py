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
        b = oc["beta"][:, j]
        se = np.hypot(_batch_se(a), _batch_se(b))
        assert abs(a.mean() - b.mean()) < 5 * se, (
            f"beta[{j}]: {a.mean():.4f} vs {b.mean():.4f}, se={se:.4f}"
        )
    a, b = out["tausq_mcmc"][0], oc["tausq"]
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
