"""Pallas lane-parallel Cholesky kernel parity (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from spamtree_tpu.ops.pallas_chol import chol_and_inv_lanes


def test_chol_and_inv_lanes_matches_lapack():
    rng = np.random.default_rng(0)
    for B, S in ((7, 16), (130, 33), (64, 50)):
        M = rng.normal(size=(B, S, S)).astype(np.float32)
        A = M @ M.transpose(0, 2, 1) + 5 * np.eye(S, dtype=np.float32)
        with jax.disable_jit():  # interpret path without x64 interference
            L, X = chol_and_inv_lanes(jnp.asarray(A), interpret=True)
        L0 = np.linalg.cholesky(A.astype(np.float64))
        X0 = np.stack([np.linalg.inv(l) for l in L0])
        assert np.abs(np.asarray(L, np.float64) - L0).max() < 5e-4
        assert np.abs(np.asarray(X, np.float64) - X0).max() < 5e-4


def test_inv_chol_lanes_matches_pair():
    from spamtree_tpu.ops.pallas_chol import inv_chol_lanes

    rng = np.random.default_rng(3)
    for B, S in ((5, 7), (130, 16)):
        M = rng.normal(size=(B, S, S))
        A = M @ np.transpose(M, (0, 2, 1)) + S * np.eye(S)
        L, X = chol_and_inv_lanes(jnp.asarray(A), interpret=True)
        X2 = inv_chol_lanes(jnp.asarray(A), interpret=True)
        np.testing.assert_allclose(np.asarray(X2), np.asarray(X),
                                   rtol=1e-10, atol=1e-12)
