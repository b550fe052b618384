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
