"""Posterior summary helpers.

Equivalents of the exported user-side utilities ``list_mean``,
``list_cubes_mean`` and ``list_qtile`` (reference: src/list_mean.cpp:10-137),
which average / quantile elementwise across a list (or stacked array) of MCMC
sample matrices.
"""

from __future__ import annotations

import numpy as np


def _stack(x):
    if isinstance(x, (list, tuple)):
        return np.stack([np.asarray(v) for v in x], axis=0)
    return np.asarray(x)


def list_mean(x):
    """Elementwise mean across samples (axis 0 of the stacked array)."""
    return _stack(x).mean(axis=0)


def list_qtile(x, q):
    """Elementwise quantile across samples (linear interpolation)."""
    return np.quantile(_stack(x), q, axis=0)


def list_cubes_mean(x, cslice):
    """Mean of slice ``cslice`` across a list of 3-d arrays."""
    arr = _stack(x)
    if cslice >= arr.shape[-1]:
        raise ValueError("Selected resolution does not exist.")
    return arr[..., cslice].mean(axis=0)


def rhat(x):
    """Split-R-hat (Gelman-Rubin potential scale reduction) per parameter.

    ``x`` has shape (draws, chains, ...) -- the layout multi-chain
    ``spamtree(..., n_chains=C)`` returns.  Chains are split in half so the
    diagnostic also detects within-chain drift.  The reference has no
    multi-chain machinery at all (single-chain driver, spamtree_fit.cpp:
    167-391); this supports the chains x blocks mesh runs.
    """
    x = np.asarray(x, dtype=np.float64)
    if x.ndim < 2:
        raise ValueError("rhat needs (draws, chains, ...) samples")
    m = (x.shape[0] // 2) * 2
    # split each chain into halves -> 2C pseudo-chains of length m/2
    halves = np.concatenate([x[: m // 2], x[m // 2 : m]], axis=1)
    nn = halves.shape[0]
    cmean = halves.mean(axis=0)
    cvar = halves.var(axis=0, ddof=1)
    W = cvar.mean(axis=0)
    B = nn * cmean.var(axis=0, ddof=1)
    var_post = (nn - 1) / nn * W + B / nn
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sqrt(var_post / W)


def ess(x):
    """Bulk effective sample size via Geyer initial-positive-sequence
    autocorrelation truncation, summed over chains.  ``x``: (draws, chains, ...)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 2:
        x = x[..., None]
        squeeze = True
    else:
        squeeze = False
    n, c = x.shape[0], x.shape[1]
    flat = x.reshape(n, c, -1)
    out = np.empty(flat.shape[2])
    for j in range(flat.shape[2]):
        rho_sum = 0.0
        for ch in range(c):
            v = flat[:, ch, j] - flat[:, ch, j].mean()
            if v.std() == 0:
                continue
            ac = np.correlate(v, v, mode="full")[n - 1 :] / (v @ v)
            # Geyer: sum consecutive lag pairs while positive
            s = 0.0
            for t in range(1, n - 2, 2):
                pair = ac[t] + ac[t + 1]
                if pair <= 0:
                    break
                s += pair
            rho_sum += s
        denom = 1.0 + 2.0 * rho_sum / c
        out[j] = n * c / max(denom, 1e-12)
    out = out.reshape(x.shape[2:])
    return float(out[0]) if squeeze else out


def find_nan(x):
    """Row indices with any non-finite entry (reference: src/find_nan.cpp)."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    return np.flatnonzero(~np.isfinite(x).all(axis=1))


def find_not_nan(x):
    """Row indices with all entries finite (reference: src/find_nan.cpp)."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    return np.flatnonzero(np.isfinite(x).all(axis=1))
