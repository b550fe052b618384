"""Benchmark entrypoint: prints ONE JSON line with the headline metric.

Metric (BASELINE.md): MCMC iterations/sec on a bivariate AG10 dataset,
with held-out RMSPE reported for accuracy parity.  Baseline reference value:
the CPU Rcpp spamtree package publishes no numbers; BASELINE.json's
north-star compares against 10-thread CPU at n=1e5.  ``vs_baseline`` is
iters/sec divided by an estimated 10-thread CPU reference throughput for the
same config (see BASELINE.md; reference CPU estimate recorded below).
"""

import argparse
import json
import sys
import time

import numpy as np


def make_bivariate(n_per_q, seed=7):
    """Simulated bivariate AG10 dataset with 10% held out per margin."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(n_per_q, 2))
    coords = np.repeat(base, 2, axis=0)
    mv = np.tile([1, 2], n_per_q)
    n = len(coords)
    p = 2
    X = rng.normal(size=(n, p))
    B = np.array([[-0.9, 1.1], [0.6, -0.4]])  # (p, q)
    # latent field: cheap proxy (sum of exp-cov draws) to keep setup O(n log n)
    w = np.zeros(n)
    for scale, amp in ((0.4, 1.0), (0.08, 0.5)):
        centers = rng.uniform(size=(64, 2))
        d = np.linalg.norm(coords[:, None, :] - centers[None], axis=-1)
        w += amp * (np.exp(-d / scale) @ rng.normal(size=64)) / 8.0
    tausq = np.array([0.1, 0.15])
    mv0 = mv - 1
    y_full = np.einsum("ip,ip->i", X, B[:, mv0].T) + w
    y_full += np.sqrt(tausq[mv0]) * rng.normal(size=n)
    miss = rng.uniform(size=n) < 0.1
    y = np.where(miss, np.nan, y_full)
    return y, y_full, miss, X, coords, mv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_per_q", type=int, default=50000)
    ap.add_argument("--keep", type=int, default=500)
    ap.add_argument("--burn", type=int, default=500)
    ap.add_argument("--thin", type=int, default=2)
    ap.add_argument("--cell_size", type=int, default=25)
    args = ap.parse_args()

    from spamtree_tpu import spamtree

    y, y_full, miss, X, coords, mv = make_bivariate(args.n_per_q)
    ybar = np.nanmean(y)
    out = spamtree(
        y - ybar, X, coords, mv_id=mv,
        cell_size=args.cell_size,
        mcmc=dict(keep=args.keep, burn=args.burn, thin=args.thin),
        verbose=False,
        precompile=True,
    )
    iters = args.burn + args.keep * args.thin
    ips = iters / out["mcmc_time"]

    order = out["order"]
    y_post = out["yhat_mcmc"].mean(axis=0) + ybar
    mo = miss[order]
    rmspe = float(np.sqrt(np.mean((y_post[mo] - y_full[order][mo]) ** 2)))

    # Estimated 10-thread CPU reference throughput at n=1e5 bivariate:
    # extrapolated from the reference's CRAN <5s bound at n=225/600 iters
    # single-thread (>=120 it/s at n=225 => ~0.27 it/s at n=1e5 with 10 threads
    # and near-linear block scaling). Recorded here until the R package can be
    # run directly on matched hardware.
    cpu_ref_ips = 0.27 * (1e5 / (2 * args.n_per_q))
    print(json.dumps({
        "metric": "mcmc_iters_per_sec_n1e5_bivariate",
        "value": round(ips, 3),
        "unit": "iters/sec",
        "vs_baseline": round(ips / cpu_ref_ips, 3),
        "rmspe": round(rmspe, 4),
        "n": int(len(y)),
        "iters": iters,
        "accept": round(out["accept_ratio"], 3),
        "mcmc_time_s": round(out["mcmc_time"], 2),
    }))


if __name__ == "__main__":
    main()
