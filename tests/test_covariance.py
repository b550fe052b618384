"""Covariance kernel parity tests.

Validates the vectorized JAX kernels against an independent per-pair NumPy
implementation of the AG10 eq.(7) cross-covariance (written from the formulas,
matching the reference's semantics at covariance_functions.cpp:213-298).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spamtree_tpu.ops.covariance import (
    cross_covariance_ag10,
    make_cov_model,
    pairwise_cov,
    pairwise_cov_diag,
    unpack_theta,
    vec_to_symmat,
)


def np_c_base(h, v, thetamv, q):
    if q > 2:
        a, b, c = thetamv[0], thetamv[1], thetamv[2]
        psi = np.exp(0.5 * b * np.log1p(a * v))
        return np.exp(-c * h / psi) / psi**2
    elif q == 2:
        c = thetamv[0]
        return np.exp(-c * h / np.sqrt(v + 1.0)) / (v + 1.0)
    return np.exp(-thetamv[0] * h)


def np_ag10(cx1, mv1, cx2, mv2, ai1, ai2, phi_i, thetamv, Dmat):
    q = Dmat.shape[0]
    out = np.zeros((len(cx1), len(cx2)))
    for i in range(len(cx1)):
        for j in range(len(cx2)):
            h = np.linalg.norm(cx1[i, :2] - cx2[j, :2])
            v = Dmat[mv1[i], mv2[j]]
            if v == 0:
                out[i, j] = ai1[mv1[i]] ** 2 * np_c_base(h, 0.0, thetamv, q) + ai2[
                    mv1[i]
                ] ** 2 * np.exp(-phi_i[mv1[i]] * h)
            else:
                out[i, j] = ai1[mv1[i]] * ai1[mv2[j]] * np_c_base(h, v, thetamv, q)
    return out


@pytest.mark.parametrize("q", [2, 3])
def test_ag10_matches_naive(q):
    rng = np.random.default_rng(0)
    n1, n2 = 13, 9
    cx1 = rng.uniform(size=(n1, 2))
    cx2 = rng.uniform(size=(n2, 2))
    mv1 = rng.integers(0, q, n1)
    mv2 = rng.integers(0, q, n2)
    spec = make_cov_model(2, q)
    k = q * (q - 1) // 2
    theta = np.abs(rng.normal(1.0, 0.3, spec.npars + k)) + 0.2
    params = unpack_theta(jnp.asarray(theta), spec)
    got = np.asarray(pairwise_cov(jnp.asarray(cx1), jnp.asarray(mv1), jnp.asarray(cx2), jnp.asarray(mv2), params, spec))

    ai1 = theta[:q]
    ai2 = theta[q : 2 * q]
    phi_i = theta[2 * q : 3 * q]
    thetamv = theta[3 * q : 3 * q + spec.n_cbase]
    Dmat = np.asarray(vec_to_symmat(jnp.asarray(theta[spec.npars :]), q))
    want = np_ag10(cx1, mv1, cx2, mv2, ai1, ai2, phi_i, thetamv, Dmat)
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # diagonal helper agrees with the dense kernel at zero distance
    d_got = np.asarray(
        pairwise_cov_diag(jnp.asarray(cx1), jnp.asarray(mv1), params, spec)
    )
    d_want = np.diag(np_ag10(cx1, mv1, cx1, mv1, ai1, ai2, phi_i, thetamv, Dmat))
    np.testing.assert_allclose(d_got, d_want, rtol=1e-10)


def test_univariate_fast_path():
    """q=1 on 2-d: K = sigmasq * exp(-phi h) with sigmasq=theta[0], phi=theta[3]
    (reference: covariance_functions.cpp:220-221)."""
    rng = np.random.default_rng(1)
    cx = rng.uniform(size=(10, 2))
    spec = make_cov_model(2, 1)
    assert spec.npars == 4 and spec.k == 0
    theta = np.array([2.3, 0.7, 0.5, 6.0])
    params = unpack_theta(jnp.asarray(theta), spec)
    mv = np.zeros(10, dtype=np.int64)
    got = np.asarray(pairwise_cov(jnp.asarray(cx), jnp.asarray(mv), jnp.asarray(cx), jnp.asarray(mv), params, spec))
    d = np.linalg.norm(cx[:, None] - cx[None, :], axis=-1)
    np.testing.assert_allclose(got, 2.3 * np.exp(-6.0 * d), rtol=1e-12)


def test_vec_to_symmat():
    x = jnp.asarray([1.0, 2.0, 3.0])  # q=3 strict lower col-major: (1,0),(2,0),(2,1)
    m = np.asarray(vec_to_symmat(x, 3))
    want = np.array([[0, 1, 2], [1, 0, 3], [2, 3, 0.0]])
    np.testing.assert_allclose(m, want)


def test_cross_covariance_ag10_public():
    """Public builder (1-based mv ids) produces a chol-able PD matrix."""
    rng = np.random.default_rng(2)
    n = 40
    cx = rng.uniform(size=(n, 2))
    mv = rng.integers(1, 3, n)
    C = np.asarray(
        cross_covariance_ag10(
            cx, mv, cx, mv,
            ai1=np.array([1.0, 1.5]), ai2=np.array([0.5, 0.6]),
            phi_i=np.array([5.0, 4.0]), thetamv=np.array([3.0]),
            Dmat=np.array([[0.0, 1.0], [1.0, 0.0]]),
        )
    )
    np.testing.assert_allclose(C, C.T, atol=1e-12)
    np.linalg.cholesky(C + 1e-10 * np.eye(n))


def test_nonspatial_univariate():
    rng = np.random.default_rng(3)
    cx = rng.uniform(size=(8, 4))
    spec = make_cov_model(4, 1)
    theta = np.array([1.7, 0.2, 0.4, 0.6, 0.8])
    params = unpack_theta(jnp.asarray(theta), spec)
    mv = np.zeros(8, dtype=np.int64)
    got = np.asarray(pairwise_cov(jnp.asarray(cx), jnp.asarray(mv), jnp.asarray(cx), jnp.asarray(mv), params, spec))
    want = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            wsq = np.sum(theta[1:] * (cx[i] - cx[j]) ** 2)
            want[i, j] = 1.7 * np.exp(-wsq) + (1e-3 if wsq == 0 else 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)
