"""Covariance kernels for SpamTree GPs, TPU-native (pure JAX, batched).

Implements the same covariance families as the reference package
(reference: src/covariance_functions.cpp):

* model 0 — Apanasovich & Genton (2010) eq. (7) multivariate spatial
  cross-covariance on a 2-d domain (``mvCovAG20107_inplace``,
  covariance_functions.cpp:213-298), with the univariate fast path
  ``cexpcov`` (covariance_functions.cpp:95-111) when q == 1.
* model 1 — nonspatial univariate anisotropic exponential over many inputs
  (``NonspatialUnivariate_inplace``, covariance_functions.cpp:358-393).
* model 2 — AG10 with elevation as a third coordinate
  (``mvWithElevation_inplace``, covariance_functions.cpp:138-209).

Unlike the reference's per-pair double loops, everything here is written as
dense broadcasted expressions so that XLA maps the work onto the VPU/MXU and
``vmap`` can batch whole tree levels of blocks at once.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CovModel(NamedTuple):
    """Static covariance-model spec (shape-only info; safe to close over in jit).

    Mirrors the integer bookkeeping of ``CovarianceParams`` construction
    (reference: src/covariance_functions.cpp:6-32).

    ``npars`` counts the non-latent-distance parameters: 3q + n_cbase
    (+1 for elevation); the full theta vector has ``npars + k`` entries where
    ``k = q(q-1)/2`` are the latent cross-distances packed into Dmat.
    """

    model: int  # 0 = AG10 spatial 2d, 1 = nonspatial univariate, 2 = AG10 + elevation
    q: int
    dd: int
    n_cbase: int
    npars: int
    k: int


def make_cov_model(dd: int, q: int, covariance_model: int = -1) -> CovModel:
    """Choose and size the covariance model (reference: covariance_functions.cpp:10-32)."""
    model = covariance_model
    if model == -1:
        if dd == 2:
            model = 0
        else:
            if q > 1:
                raise NotImplementedError(
                    "Multivariate on many inputs not implemented (matches reference)."
                )
            model = 1
    k = q * (q - 1) // 2
    if model == 0:
        n_cbase = 3 if q > 2 else 1
        npars = 3 * q + n_cbase
    elif model == 2:
        n_cbase = 3 if q > 2 else 1
        npars = 3 * q + n_cbase + 1
    elif model == 1:
        # sigmasq + one kernel weight per input column
        n_cbase = 0
        npars = 1 + dd
        k = 0
    else:
        raise ValueError(f"Unknown covariance model {model}")
    return CovModel(model=model, q=q, dd=dd, n_cbase=n_cbase, npars=npars, k=k)


class CovParams(NamedTuple):
    """Traced covariance parameters (one of the groups may be unused per model)."""

    ai1: jax.Array  # (q,)
    ai2: jax.Array  # (q,)
    phi_i: jax.Array  # (q,)
    thetamv: jax.Array  # (n_cbase,)
    Dmat: jax.Array  # (q, q) latent cross-distances, 0 diagonal
    d_elevation: jax.Array  # scalar (model 2)
    sigmasq: jax.Array  # scalar (model 1)
    kweights: jax.Array  # (dd,) (model 1)


def vec_to_symmat(x: jax.Array, q: int) -> jax.Array:
    """Unpack q(q-1)/2 strictly-lower-triangular entries (column-major order)
    into a symmetric (q, q) matrix with zero diagonal.

    Matches ``vec_to_symmat`` (reference: covariance_functions.cpp:77-92).
    """
    res = jnp.zeros((q, q), dtype=x.dtype)
    rows, cols = [], []
    ix = 0
    for j in range(q):
        for i in range(j + 1, q):
            rows.append(i)
            cols.append(j)
            ix += 1
    rows = jnp.array(rows, dtype=jnp.int32)
    cols = jnp.array(cols, dtype=jnp.int32)
    res = res.at[rows, cols].set(x)
    return res + res.T


def unpack_theta(theta: jax.Array, spec: CovModel) -> CovParams:
    """theta vector -> covariance components (reference: covariance_functions.cpp:34-75)."""
    q = spec.q
    z = jnp.zeros((), dtype=theta.dtype)
    zq = jnp.zeros((q,), dtype=theta.dtype)
    if spec.model in (0, 2):
        ai1 = theta[0:q]
        ai2 = theta[q : 2 * q]
        phi_i = theta[2 * q : 3 * q]
        thetamv = theta[3 * q : 3 * q + spec.n_cbase]
        d_elev = theta[3 * q + spec.n_cbase] if spec.model == 2 else z
        if spec.k > 0:
            Dmat = vec_to_symmat(theta[spec.npars : spec.npars + spec.k], q)
        else:
            Dmat = jnp.zeros((1, 1), dtype=theta.dtype)
        return CovParams(ai1, ai2, phi_i, thetamv, Dmat, d_elev, z, zq)
    elif spec.model == 1:
        return CovParams(
            zq, zq, zq, z[None], jnp.zeros((1, 1), dtype=theta.dtype), z,
            theta[0], theta[1:],
        )
    raise ValueError(f"Unknown covariance model {spec.model}")


def _c_base(h, v, thetamv, q):
    """Gneiting-style base covariance C(h, v) (reference: covariance_functions.cpp:113-135).

    ``v`` is the latent cross-distance (0 for same-margin).  ``u`` (time) is
    always 0 in the live reference path, so it is dropped here.
    """
    if q > 2:
        a_psi1 = thetamv[0]
        beta_psi1 = thetamv[1]
        c_phi1 = thetamv[2]
        psi1_sqrt = jnp.exp(0.5 * beta_psi1 * jnp.log1p(a_psi1 * v))
        return jnp.exp(-c_phi1 * h / psi1_sqrt) / (psi1_sqrt * psi1_sqrt)
    elif q == 2:
        c_phi1 = thetamv[0]
        return jnp.exp(-c_phi1 * h / jnp.sqrt(v + 1.0)) / (v + 1.0)
    else:
        return jnp.exp(-thetamv[0] * h)


def pairwise_cov(
    cx1: jax.Array,
    mv1: jax.Array,
    cx2: jax.Array,
    mv2: jax.Array,
    params: CovParams,
    spec: CovModel,
) -> jax.Array:
    """Dense (n1, n2) cross-covariance between two location/margin sets.

    Equivalent of ``Covariancef`` (reference: covariance_functions.cpp:416-436)
    but fully vectorized.  ``mv*`` are 0-based margin ids.
    """
    delta = cx1[:, None, :] - cx2[None, :, :]
    if spec.model == 1:
        wsq = jnp.einsum("ijk,k->ij", delta * delta, params.kweights)
        return params.sigmasq * jnp.exp(-wsq) + jnp.where(wsq == 0, 1e-3, 0.0)

    if spec.model == 0:
        nsp = 2
    else:  # model 2: h over first 3 coords (elevation weight fixed to 1 in reference)
        nsp = 3
    d2 = jnp.sum(delta[..., :nsp] * delta[..., :nsp], axis=-1)
    h = jnp.sqrt(jnp.maximum(d2, 0.0))

    if spec.model == 0 and spec.q == 1:
        # univariate fast path: sigmasq = ai1[0], phi = thetamv[0]
        # (reference: covariance_functions.cpp:220-221 -> cexpcov 95-111)
        return params.ai1[0] * jnp.exp(-params.thetamv[0] * h)

    # TPU-friendly form: the latent cross-distance table lookup
    # v = Dmat[mv_i, mv_j] is a gather-free one-hot contraction, and since
    # C_base(h, 0) is the same-margin base, a single C_base(h, v) evaluation
    # covers both branches -- only the margin-specific nugget term needs the
    # v == 0 select.  Exactly equal to the reference's per-pair branches
    # (covariance_functions.cpp:250-255), including the degenerate case of a
    # user-supplied Dmat with zero off-diagonals (row-margin ai1^2 applies).
    q = params.ai1.shape[0]
    oh1 = jax.nn.one_hot(mv1, q, dtype=cx1.dtype)
    oh2 = jax.nn.one_hot(mv2, q, dtype=cx2.dtype)
    v = jnp.einsum("iq,qr,jr->ij", oh1, params.Dmat, oh2)
    # per-row theta-param lookups as one-hot contractions, NOT gathers:
    # a[mv] depends on theta, so it cannot loop-hoist, and under the
    # vmapped multi-chain step these gathers lowered to the pathological
    # scalar-gather path (6.4 ms each per iteration at n=1e5 C=2 -- the
    # round-5 chains profile).  The contraction is exact (one nonzero
    # term) and fuses into the surrounding elementwise chain.
    ai1_i = (oh1 @ params.ai1)[:, None]
    ai1_j = (oh2 @ params.ai1)[None, :]
    ai2_i = (oh1 @ params.ai2)[:, None]
    phi_ii = (oh1 @ params.phi_i)[:, None]
    same = v == 0
    coef = jnp.where(same, ai1_i * ai1_i, ai1_i * ai1_j)
    nugget = jnp.where(same, ai2_i * ai2_i * jnp.exp(-phi_ii * h), 0.0)
    return coef * _c_base(h, v, params.thetamv, spec.q) + nugget


def pairwise_cov_diag(
    cx: jax.Array, mv: jax.Array, params: CovParams, spec: CovModel
) -> jax.Array:
    """Variance at each row: diag of pairwise_cov(cx, cx) without the n^2 cost.

    Used by the per-location (thin / prediction) paths which in the reference
    build 1x1 Kcc matrices per location (e.g. spamtree_model.cpp:934, 1310).
    """
    if spec.model == 1:
        return jnp.full(cx.shape[:-1], params.sigmasq + 1e-3, dtype=cx.dtype)
    if spec.model == 0 and spec.q == 1:
        return jnp.full(cx.shape[:-1], params.ai1[0], dtype=cx.dtype)
    zero = jnp.zeros(cx.shape[:-1], dtype=cx.dtype)
    oh = jax.nn.one_hot(mv, params.ai1.shape[0], dtype=cx.dtype)
    ai1 = oh @ params.ai1  # contraction, not gather (see pairwise_cov)
    ai2 = oh @ params.ai2
    return ai1 * ai1 * _c_base(zero, zero, params.thetamv, spec.q) + ai2 * ai2


def cross_covariance_ag10(
    coords1, mv1, coords2, mv2, ai1, ai2, phi_i, thetamv, Dmat
) -> jax.Array:
    """Public AG10 cross-covariance builder for data generation.

    Equivalent of the exported ``CrossCovarianceAG10``
    (reference: covariance_functions.cpp:301-355).  ``mv*`` are 1-based margin
    ids, as in the reference's user-facing API.
    """
    coords1 = jnp.asarray(coords1)
    coords2 = jnp.asarray(coords2)
    Dmat = jnp.asarray(Dmat)
    q = Dmat.shape[0]
    if q < 2:
        raise ValueError("Invalid Dmat for multivariate data")
    dd = coords1.shape[1]
    spec = CovModel(model=0, q=q, dd=dd, n_cbase=(3 if q > 2 else 1), npars=0, k=0)
    params = CovParams(
        jnp.asarray(ai1), jnp.asarray(ai2), jnp.asarray(phi_i),
        jnp.asarray(thetamv), Dmat,
        jnp.zeros(()), jnp.zeros(()), jnp.zeros((dd,)),
    )
    mv1 = jnp.asarray(mv1, dtype=jnp.int32) - 1
    mv2 = jnp.asarray(mv2, dtype=jnp.int32) - 1
    return pairwise_cov(coords1, mv1, coords2, mv2, params, spec)
