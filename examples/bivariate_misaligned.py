"""Bivariate misaligned example: the reference vignette config
(reference: vignettes/spatial_multivariate.Rmd): two outcomes observed on
different spatial regions (misalignment), data simulated from the exact AG10
cross-covariance via CrossCovarianceAG10, fit + cross-margin prediction in
one MCMC run.
"""

import argparse
import time

import numpy as np


def run(n_per_q=900, keep=200, burn=200, thin=2, seed=2021, verbose=True):
    import jax.numpy as jnp

    from spamtree_tpu import CrossCovarianceAG10, spamtree

    rng = np.random.default_rng(seed)
    SS = int(np.sqrt(n_per_q))
    xx = np.linspace(0, 1, SS)
    g1, g2 = np.meshgrid(xx, xx)
    base = np.c_[g1.ravel(), g2.ravel()]
    coords = np.vstack([base, base])
    n = len(coords)
    mv = np.r_[np.ones(len(base), int), 2 * np.ones(len(base), int)]

    # exact AG10 covariance draw (vignette: Rmd:68-70)
    ai1 = np.array([1.0, 1.5])
    ai2 = np.array([0.1, 0.1])
    phi_i = np.array([5.0, 5.0])
    thetamv = np.array([5.0])
    Dmat = np.array([[0.0, 1.0], [1.0, 0.0]])
    C = np.asarray(CrossCovarianceAG10(coords, mv, coords, mv,
                                       ai1, ai2, phi_i, thetamv, Dmat))
    w = np.linalg.cholesky(C + 1e-8 * np.eye(n)) @ rng.normal(size=n)

    p = 2
    X = rng.normal(size=(n, p))
    B = np.array([[-0.5, 1.0], [1.5, -0.8]])
    tausq = np.array([0.03, 0.05])
    mv0 = mv - 1
    y_full = np.einsum("ip,ip->i", X, B[:, mv0].T) + w
    y_full += np.sqrt(tausq[mv0]) * rng.normal(size=n)

    # misalignment: outcome 1 missing on one rectangle, outcome 2 on another
    # (vignette: Rmd:79-84)
    miss = np.zeros(n, dtype=bool)
    in_r1 = (coords[:, 0] > 0.3) & (coords[:, 0] < 0.6) & (coords[:, 1] > 0.6)
    in_r2 = (coords[:, 0] < 0.3) & (coords[:, 1] > 0.3) & (coords[:, 1] < 0.6)
    miss |= (mv == 1) & in_r1
    miss |= (mv == 2) & in_r2
    y = np.where(miss, np.nan, y_full)

    t0 = time.time()
    out = spamtree(
        y, X, coords, mv_id=mv,
        mcmc=dict(keep=keep, burn=burn, thin=thin),
        verbose=verbose, seed=seed,
    )
    wall = time.time() - t0
    order = out["order"]
    y_post = out["yhat_mcmc"].mean(axis=0)
    mo = miss[order]
    rmspe = float(np.sqrt(np.mean((y_post[mo] - y_full[order][mo]) ** 2)))
    w_post = out["w_mcmc"].mean(axis=0)
    wc = float(np.corrcoef(w_post, w[order])[0, 1])
    return dict(rmspe=rmspe, sd_y=float(y_full.std()), w_corr=wc,
                accept=out["accept_ratio"], wall=wall,
                mcmc_time=out["mcmc_time"])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_per_q", type=int, default=900)
    ap.add_argument("--keep", type=int, default=200)
    ap.add_argument("--burn", type=int, default=200)
    a = ap.parse_args()
    res = run(n_per_q=a.n_per_q, keep=a.keep, burn=a.burn)
    for k, v in res.items():
        print(f"{k}: {v}")
