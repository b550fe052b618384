"""Multi-chain fit with convergence diagnostics.

The reference driver runs exactly one chain (reference: spamtree_fit.cpp:
167-391); here independent chains are vmapped into one device program (and
shard over the ``chains`` mesh axis on multi-chip hardware), so cross-chain
convergence checks (split R-hat, ESS) come almost for free.

Usage: python examples/multichain.py [n] [n_chains]
"""

import sys

import numpy as np


def run(n=2000, n_chains=2, keep=300, burn=300, verbose=False):
    from spamtree_tpu import rhat, spamtree
    from spamtree_tpu.utils.summaries import ess

    rng = np.random.default_rng(5)
    coords = rng.uniform(size=(n, 2))
    X = rng.normal(size=(n, 2))
    B = np.array([1.0, -0.5])
    w = np.sin(coords[:, 0] * 8) * np.cos(coords[:, 1] * 8)
    y = X @ B + w + np.sqrt(0.1) * rng.normal(size=n)
    y[rng.uniform(size=n) < 0.1] = np.nan

    out = spamtree(
        y, X, coords,
        mcmc=dict(keep=keep, burn=burn, thin=2),
        n_chains=n_chains, verbose=verbose, precompile=True,
    )
    # theta_mcmc: (keep, C, n_theta); beta: (keep, C, p, q)
    rh_theta = rhat(out["theta_mcmc"])
    rh_beta = rhat(out["beta_mcmc"]).ravel()
    ess_theta = ess(out["theta_mcmc"])
    return dict(
        rhat_theta=np.round(rh_theta, 3).tolist(),
        rhat_beta=np.round(rh_beta, 3).tolist(),
        ess_theta=np.round(ess_theta, 1).tolist(),
        accept=float(out["accept_ratio"]),
        beta_mean=np.asarray(out["beta_mcmc"]).mean(axis=(0, 1)).ravel().tolist(),
        beta_true=B.tolist(),
        mcmc_time=out["mcmc_time"],
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    print(run(n, c, verbose=True))
