"""save_fit/load_fit: one-file persistence of a spamtree() fit.

The reference's users persist fits with R's saveRDS (the returned list is
plain R data, spamtree_fit.R:365-370).  The gates here: a saved-then-loaded
fit is bit-identical in every array and equal in every metadata field, and
feeds spamtree_predict to the SAME draws as the in-memory fit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spamtree_tpu import spamtree, spamtree_predict
from spamtree_tpu.utils.fitio import load_fit, save_fit


def _sim(n=260, seed=11):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    C = np.exp(-6.0 * d)
    w = np.linalg.cholesky(C + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    X = rng.normal(size=(n, 2))
    y = X @ np.array([1.0, -0.5]) + w + 0.1 * rng.normal(size=n)
    return coords, X, y


def _assert_same(a, b, path=""):
    # numpy scalars serialize to plain python scalars by design
    if isinstance(a, np.generic):
        a = a.item()
    if isinstance(b, np.generic):
        b = b.item()
    if isinstance(a, np.ndarray):
        assert a.dtype == b.dtype and a.shape == b.shape, path
        np.testing.assert_array_equal(a, b, err_msg=path)
    elif isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_same(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_same(x, y, f"{path}[{i}]")
    elif isinstance(a, float) and np.isnan(a):
        assert isinstance(b, float) and np.isnan(b), path
    else:
        assert a == b, (path, a, b)


def test_fit_roundtrip_and_predict(tmp_path):
    coords, X, y = _sim()
    held = np.zeros(len(y), bool)
    held[::6] = True
    obs = ~held
    fit = spamtree(y[obs], X[obs], coords[obs],
                   mcmc=dict(keep=60, burn=80, thin=1),
                   cell_size=16, K=2, seed=7, dtype=jnp.float64)

    path = tmp_path / "fit.npz"
    save_fit(str(path), fit)
    fit2 = load_fit(str(path))

    # tree/schedule deliberately dropped, everything else equal
    assert fit2.pop("skipped_on_save") == ["tree", "schedule"]
    ref = {k: v for k, v in fit.items() if k not in ("tree", "schedule")}
    # dtype classes normalize to np.dtype on load
    ref["fit_config"] = dict(ref["fit_config"],
                             dtype=np.dtype(ref["fit_config"]["dtype"]))
    _assert_same(ref, fit2)

    # a loaded fit drives spamtree_predict to the exact same draws
    kw = dict(y=y[obs], x=X[obs], coords=coords[obs],
              coords_new=coords[held], x_new=X[held], seed=3)
    pa = spamtree_predict(fit, **kw)
    pb = spamtree_predict(fit2, **kw)
    np.testing.assert_array_equal(pa["w_pred"], pb["w_pred"])
    np.testing.assert_array_equal(pa["yhat_pred"], pb["yhat_pred"])


def test_load_rejects_non_fit(tmp_path):
    p = tmp_path / "x.npz"
    np.savez(p, a=np.arange(3))
    with pytest.raises(ValueError, match="not a spamtree fit"):
        load_fit(str(p))
