"""Lane-parallel batched Cholesky + triangular inverse (Pallas TPU kernel).

The SpamTree sweeps factorize thousands of small (S <= 64) SPD matrices per
tree level.  XLA's batched Cholesky runs an S-step loop with poor lane
utilization at these sizes; this kernel lays the *batch* dimension along the
128 TPU lanes ((S, S, 128) tiles in VMEM) so each of the S sequential
factorization steps is a dense VPU op over 128 independent matrices, and it
fuses the forward-substitution inverse so L never round-trips to HBM.
All updates are masked full-tile ops (no dynamic ref indexing).

Replaces the reference's per-block ``arma::chol`` + ``arma::inv(trimatl(...))``
pairs (e.g. spamtree_model.cpp:866, 896-897) on the TPU path; the plain-XLA
fallback (ops.linalg) is used on other backends and for S > MAX_S.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# lane-block: matrices processed per kernel instance.  128 = one lane
# tile; larger multiples give each grid step more independent VPU work to
# pipeline (A/B knob -- the batched chol is ~1.8 ms/step of the round-5
# profile, examples/profile_step.py)
LB = int(_os.environ.get("SPAMTREE_CHOL_LB", "128") or 128)
MAX_S = 64


def _chol_inv_kernel(a_ref, l_ref, x_ref, *, S: int):
    """a: (S, S, LB) SPD batch -> l = chol(a) lower, x = l^{-1}."""
    _chol_inv_body(a_ref, l_ref, x_ref, S=S, keep_l=True)


def _chol_inv_body(a_ref, l_ref, x_ref, *, S: int, keep_l: bool = True):
    A = a_ref[...]
    r3 = jax.lax.broadcasted_iota(jnp.int32, (S, S, 1), 0)
    c3 = jax.lax.broadcasted_iota(jnp.int32, (S, S, 1), 1)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)

    def chol_step(j, L):
        Lrow_j = jnp.sum(jnp.where(r3 == j, L, 0.0), axis=0)
        contrib = jnp.sum(
            jnp.where(c3 < j, L * Lrow_j[None, :, :], 0.0), axis=1
        )
        aj = jnp.sum(jnp.where(c3 == j, A, 0.0), axis=1)
        c = aj - contrib
        d = jnp.sqrt(jnp.sum(jnp.where(r2 == j, c, 0.0), axis=0))
        col = jnp.where(r2 >= j, c / d[None, :], 0.0)
        return jnp.where(c3 == j, col[:, None, :], L)

    L = jax.lax.fori_loop(0, S, chol_step, jnp.zeros_like(A))
    if keep_l:
        l_ref[...] = L

    def inv_step(i, X):
        Lrow_i = jnp.sum(jnp.where(r3 == i, L, 0.0), axis=0)
        acc = jnp.sum(
            jnp.where(r3 < i, X * Lrow_i[:, None, :], 0.0), axis=0
        )
        dii = jnp.sum(jnp.where(r2 == i, Lrow_i, 0.0), axis=0)
        ei = (r2 == i).astype(A.dtype)
        xrow = (ei - acc) / dii[None, :]
        return jnp.where(r3 == i, xrow[None, :, :], X)

    X = jax.lax.fori_loop(0, S, inv_step, jnp.zeros_like(A))
    x_ref[...] = X


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_and_inv_lanes(a: jax.Array, interpret: bool = False):
    """Batched (B, S, S) SPD -> (L, Linv), both lower-triangular.

    B is padded to a multiple of LB internally (identity padding)."""
    B, S, _ = a.shape
    pad = (-B) % LB
    if pad:
        eye = jnp.broadcast_to(jnp.eye(S, dtype=a.dtype), (pad, S, S))
        a = jnp.concatenate([a, eye], axis=0)
    Bp = a.shape[0]
    at = jnp.transpose(a, (1, 2, 0))  # (S, S, Bp)

    grid = (Bp // LB,)
    spec = pl.BlockSpec((S, S, LB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    L_t, X_t = pl.pallas_call(
        functools.partial(_chol_inv_kernel, S=S),
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((S, S, Bp), a.dtype),
            jax.ShapeDtypeStruct((S, S, Bp), a.dtype),
        ),
        interpret=interpret,
    )(at)
    L = jnp.transpose(L_t, (2, 0, 1))[:B]
    X = jnp.transpose(X_t, (2, 0, 1))[:B]
    return L, X


@functools.partial(jax.jit, static_argnames=("interpret",))
def inv_chol_lanes(a: jax.Array, interpret: bool = False):
    """Batched (B, S, S) SPD -> Linv only (L never leaves VMEM): halves
    the kernel's output traffic vs chol_and_inv_lanes.  Every live caller
    of the fused pair discards L and derives the ok flag from diag(Linv)
    (= 1/diag(L)), so this is the hot-path form."""
    B, S, _ = a.shape
    pad = (-B) % LB
    if pad:
        eye = jnp.broadcast_to(jnp.eye(S, dtype=a.dtype), (pad, S, S))
        a = jnp.concatenate([a, eye], axis=0)
    Bp = a.shape[0]
    at = jnp.transpose(a, (1, 2, 0))  # (S, S, Bp)

    grid = (Bp // LB,)
    spec = pl.BlockSpec((S, S, LB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    X_t = pl.pallas_call(
        lambda a_ref, x_ref: _chol_inv_body(a_ref, None, x_ref, S=S,
                                            keep_l=False),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((S, S, Bp), a.dtype),
        interpret=interpret,
    )(at)
    return jnp.transpose(X_t, (2, 0, 1))[:B]


def use_pallas_chol(S: int) -> bool:
    """Pallas path: TPU-class backend and small-enough matrices."""
    try:
        return S <= MAX_S and jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
