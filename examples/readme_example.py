"""End-to-end univariate example: the reference README config
(reference: README.md:23-111): n=SS^2 grid, exponential GP, 10% missing,
fit + predict in one MCMC run, report held-out RMSPE and beta recovery.
"""

import argparse
import time

import numpy as np


def run(SS=15, keep=300, burn=300, thin=1, seed=2021, dtype="float32",
        verbose=True, cell_size=25):
    import jax.numpy as jnp
    from spamtree_tpu import spamtree

    rng = np.random.default_rng(seed)
    n = SS * SS
    coords = rng.uniform(size=(n, 2))
    sigmasq, phi, tausq = 2.3, 6.0, 0.1
    B = np.array([-1.0, 0.5, 1.0])

    D = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    CC = sigmasq * np.exp(-phi * D)
    LC = np.linalg.cholesky(CC + 1e-10 * np.eye(n))
    w = LC @ rng.normal(size=n)
    X = rng.normal(size=(n, len(B)))
    y_full = X @ B + w + np.sqrt(tausq) * rng.normal(size=n)
    miss = rng.binomial(1, 0.1, n).astype(bool)
    y = np.where(miss, np.nan, y_full)
    ybar = np.nanmean(y)

    t0 = time.time()
    out = spamtree(
        y - ybar, X, coords,
        cell_size=cell_size,
        mcmc=dict(keep=keep, burn=burn, thin=thin),
        verbose=verbose,
        dtype=jnp.float64 if dtype == "float64" else jnp.float32,
        seed=seed,
    )
    wall = time.time() - t0

    order = out["order"]
    y_post = out["yhat_mcmc"].mean(axis=0) + ybar
    w_post = out["w_mcmc"].mean(axis=0)
    beta_post = out["beta_mcmc"][:, :, 0].mean(axis=1)

    y_full_sorted = y_full[order]
    miss_sorted = miss[order]
    w_sorted = w[order]
    rmspe = float(np.sqrt(np.mean((y_post[miss_sorted] - y_full_sorted[miss_sorted]) ** 2)))
    w_rmse = float(np.sqrt(np.mean((w_post - w_sorted) ** 2)))
    iters = burn + keep * thin
    return dict(
        rmspe=rmspe, w_rmse=w_rmse, beta=beta_post.tolist(), beta_true=B.tolist(),
        tausq_mean=float(out["tausq_mcmc"].mean()),
        accept=out["accept_ratio"], wall=wall,
        iters_per_sec=iters / out["mcmc_time"], mcmc_time=out["mcmc_time"],
        sd_y=float(np.nanstd(y_full)),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--SS", type=int, default=15)
    ap.add_argument("--keep", type=int, default=300)
    ap.add_argument("--burn", type=int, default=300)
    ap.add_argument("--thin", type=int, default=1)
    ap.add_argument("--dtype", default="float32")
    a = ap.parse_args()
    res = run(SS=a.SS, keep=a.keep, burn=a.burn, thin=a.thin, dtype=a.dtype)
    for k, v in res.items():
        print(f"{k}: {v}")
