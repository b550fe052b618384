"""Batched masked linear algebra helpers (identity-padding semantics).

These wrap XLA's batched Cholesky / triangular-solve so that per-level block
batches with padded slots stay exact: padded rows/cols carry an identity
block, so factorizations and solves are well-defined and contribute nothing
to log-determinants or quadratic forms.

TPU-native replacement for the reference's per-block
``arma::chol`` / ``arma::inv(arma::trimatl(...))`` calls
(e.g. reference: src/spamtree_model.cpp:866, 896-897) and the 2x2-block
inverse-Cholesky assembly (src/tree_utils.cpp:194-208).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def identity_pad(mat: jax.Array, mask: jax.Array) -> jax.Array:
    """Replace padded rows/cols of a batched (B, S, S) matrix with identity.

    ``mask`` is (B, S) validity.  Real block untouched; padded slots become
    independent unit-variance entries.
    """
    m2 = mask[..., :, None] & mask[..., None, :]
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return jnp.where(m2, mat, eye)


def chol_masked(mat: jax.Array, mask: jax.Array):
    """Cholesky of identity-padded batch; returns (L, ok) with ok per block."""
    L = jnp.linalg.cholesky(identity_pad(mat, mask))
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(d) & (d > 0), axis=-1)
    return L, ok


def tri_solve(L: jax.Array, b: jax.Array, trans: bool = False) -> jax.Array:
    """Solve L x = b (or L' x = b) for batched lower-triangular L."""
    return jax.lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=trans
    )


def tri_inv(L: jax.Array) -> jax.Array:
    """Explicit inverse of a batched lower-triangular factor."""
    eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
    return tri_solve(L, eye)


def chol_inv_masked(mat: jax.Array, mask: jax.Array, use_pallas: bool = False):
    """Fused Cholesky + triangular inverse of an identity-padded batch.

    Returns (L, Linv, ok).  On TPU with S <= 64 dispatches to the
    lane-parallel Pallas kernel (ops.pallas_chol) in its inv-only form —
    every live caller discards L, so the kernel never writes it to HBM
    and **L comes back None on that path** (the ok flag derives from
    diag(Linv) = 1/diag(L), an equivalent positivity/finiteness check).
    The XLA fallback still returns the real L.
    """
    m = identity_pad(mat, mask)
    if use_pallas:
        from spamtree_tpu.ops.pallas_chol import inv_chol_lanes

        Linv = inv_chol_lanes(m)
        L = None
    else:
        L = jnp.linalg.cholesky(m)
        Linv = tri_inv(L)
    d = jnp.diagonal(Linv if L is None else L, axis1=-2, axis2=-1)
    ok = jnp.all(jnp.isfinite(d) & (d > 0), axis=-1)
    return L, Linv, ok
