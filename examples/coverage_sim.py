"""Posterior-calibration study: credible-interval coverage over replicates.

The reference's core validation pattern is simulate-from-the-model ->
recover (man/spamtree.Rd:128-208, vignettes/spatial_multivariate.Rmd) --
checked visually.  This script makes it quantitative: simulate R datasets
from the exact generative model (AG10/exponential GP + linear mean +
Gaussian noise), fit each with the full MCMC cycle, and measure how often
the nominal central credible intervals cover the truth:

* beta: per-coefficient coverage across replicates,
* w at observed locations: pooled across locations and replicates,
* yhat at held-out locations: pooled posterior-predictive coverage.

A correct sampler gives ~nominal coverage (up to MC error from finite
keep and R); a biased one shows up as systematic under/over-coverage.
All replicates share one set of shapes, so the sampler compiles once.

Usage: python examples/coverage_sim.py [R] [n] [keep] [burn] [level]
"""

import sys

import numpy as np


def run(R=24, n=400, keep=300, burn=300, level=0.9, seed0=100,
        backend=None, verbose=False):
    if backend:
        import jax

        jax.config.update("jax_platforms", backend)
    from spamtree_tpu.api import spamtree

    alpha = (1.0 - level) / 2.0
    beta_true = np.array([-1.0, 0.5])
    phi, sigmasq, tausq = 6.0, 1.0, 0.05

    beta_cover = np.zeros(len(beta_true))
    w_cover = w_tot = 0
    y_cover = y_tot = 0
    rmspes = []

    for r in range(R):
        rng = np.random.default_rng(seed0 + r)
        coords = rng.uniform(size=(n, 2))
        d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
        C = sigmasq * np.exp(-phi * d)
        w = np.linalg.cholesky(C + 1e-10 * np.eye(n)) @ rng.normal(size=n)
        X = rng.normal(size=(n, len(beta_true)))
        y_full = X @ beta_true + w + np.sqrt(tausq) * rng.normal(size=n)
        miss = rng.uniform(size=n) < 0.12
        y = np.where(miss, np.nan, y_full)

        out = spamtree(y, X, coords, mcmc=dict(keep=keep, burn=burn, thin=1),
                       cell_size=16, K=2, seed=seed0 + r, verbose=False)

        # beta_mcmc is (p, keep, q) -- the reference's layout
        bq = np.quantile(out["beta_mcmc"], [alpha, 1 - alpha], axis=1)
        bl, bu = bq[0].ravel(), bq[1].ravel()
        beta_cover += (bl <= beta_true) & (beta_true <= bu)

        wq = np.quantile(out["w_mcmc"], [alpha, 1 - alpha], axis=0)
        w_sorted = w[out["order"]]
        obs_sorted = np.isfinite(y[out["order"]])
        cov = (wq[0] <= w_sorted) & (w_sorted <= wq[1])
        w_cover += int(cov[obs_sorted].sum())
        w_tot += int(obs_sorted.sum())

        yq = np.quantile(out["yhat_mcmc"], [alpha, 1 - alpha], axis=0)
        yf_sorted = y_full[out["order"]]
        mi = ~obs_sorted
        ycov = (yq[0] <= yf_sorted) & (yf_sorted <= yq[1])
        y_cover += int(ycov[mi].sum())
        y_tot += int(mi.sum())

        yhat = out["yhat_mcmc"].mean(0)
        rmspes.append(float(np.sqrt(np.mean(
            (yhat[mi] - yf_sorted[mi]) ** 2))))
        if verbose:
            print(f"rep {r}: beta_cover={beta_cover}, "
                  f"w={w_cover}/{w_tot}, yhat={y_cover}/{y_tot}")

    res = dict(
        level=level, replicates=R,
        beta_coverage=(beta_cover / R).tolist(),
        w_coverage=w_cover / max(w_tot, 1),
        yhat_coverage=y_cover / max(y_tot, 1),
        rmspe_mean=float(np.mean(rmspes)),
    )
    return res


if __name__ == "__main__":
    a = sys.argv[1:]
    res = run(R=int(a[0]) if len(a) > 0 else 24,
              n=int(a[1]) if len(a) > 1 else 400,
              keep=int(a[2]) if len(a) > 2 else 300,
              burn=int(a[3]) if len(a) > 3 else 300,
              level=float(a[4]) if len(a) > 4 else 0.9,
              verbose=True)
    print(res)
