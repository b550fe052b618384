"""Sweep parity for the non-default covariance models: model 1 (nonspatial
multi-input univariate) and model 2 (AG10 + elevation), validated against
brute-force dense-block computation like the spatial tests."""

import numpy as np
import jax.numpy as jnp

from spamtree_tpu.model.core import ModelStatic, quad_loglik, sweep
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.ops.covariance import make_cov_model, pairwise_cov, unpack_theta
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _brute_ll(tree, sched, C, w):
    total = 0.0
    nb = sched.n_blocks
    for plan in sched.levels:
        # merged thin plans carry (B, M) member-id sets padded with n_blocks
        for u in np.asarray(plan.block_ids).ravel():
            if u >= nb:
                continue
            rows = tree.block_rows[u]
            par = (np.concatenate([tree.block_rows[p] for p in tree.parents[u]])
                   if len(tree.parents[u]) else np.zeros(0, dtype=np.int64))
            if par.size:
                Kpp = C[np.ix_(par, par)]
                Kpu = C[np.ix_(par, rows)]
                H = np.linalg.solve(Kpp, Kpu).T
                R = C[np.ix_(rows, rows)] - H @ Kpu
            else:
                H = np.zeros((len(rows), 0))
                R = C[np.ix_(rows, rows)]
            wx = w[rows] - H @ w[par]
            if plan.is_ref:
                sign, ld = np.linalg.slogdet(R)
                total += -0.5 * ld - 0.5 * wx @ np.linalg.solve(R, wx)
            else:
                r = np.diag(R)
                total += -0.5 * np.sum(np.log(r)) - 0.5 * np.sum(wx * wx / r)
    return total


def test_model1_nonspatial_multiinput():
    """4-d input domain -> nonspatial anisotropic exponential kernel
    (reference: covariance_functions.cpp:358-393)."""
    rng = np.random.default_rng(0)
    n, dd = 220, 4
    coords = rng.uniform(size=(n, dd))
    order = np.lexsort(tuple([np.arange(n)] + [coords[:, j] for j in range(dd - 1, -1, -1)]))
    coords = coords[order]
    mv = np.zeros(n, dtype=np.int64)
    y = rng.normal(size=n)
    tree = make_tree(coords, np.ones(n, bool), mv, axis_cell_size=2, K=2,
                     rng=rng)
    sched = build_schedule(tree)
    tspec = make_theta_spec(dd, 1)
    assert tspec.spec.model == 1 and tspec.n_theta == 1 + dd
    ms = ModelStatic(sched, coords, mv, y, np.ones((n, 1)), tspec.spec,
                     dtype=jnp.float64)
    theta = np.array([1.5, 0.3, 0.7, 1.1, 0.2])
    w = rng.normal(size=n)
    wj = jnp.asarray(np.append(w, 0.0))
    ld, _pd, logdet, ok = sweep(ms, jnp.asarray(theta), wj)
    assert bool(ok)
    got = float(logdet + quad_loglik(ms, ld, wj))
    params = unpack_theta(jnp.asarray(theta), tspec.spec)
    C = np.asarray(pairwise_cov(jnp.asarray(coords), jnp.asarray(mv),
                                jnp.asarray(coords), jnp.asarray(mv),
                                params, tspec.spec))
    want = _brute_ll(tree, sched, C, w)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_model2_elevation():
    """3-d coords with elevation (covariance model 2,
    reference: covariance_functions.cpp:138-209)."""
    rng = np.random.default_rng(1)
    n, q = 180, 2
    base = rng.uniform(size=(n // q, 3))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), n // q)
    order = np.lexsort(tuple([np.arange(n)] + [coords[:, j] for j in range(2, -1, -1)]))
    coords, mv = coords[order], mv[order]
    y = rng.normal(size=n)
    tree = make_tree(coords, np.ones(n, bool), mv, axis_cell_size=2, K=2, rng=rng)
    sched = build_schedule(tree)
    tspec = make_theta_spec(3, q, elevation=True)
    assert tspec.spec.model == 2
    ms = ModelStatic(sched, coords, mv, y, np.ones((n, 1)), tspec.spec,
                     dtype=jnp.float64)
    theta = np.abs(rng.normal(1.0, 0.2, tspec.n_theta)) + 0.3
    w = rng.normal(size=n)
    wj = jnp.asarray(np.append(w, 0.0))
    ld, _pd, logdet, ok = sweep(ms, jnp.asarray(theta), wj)
    assert bool(ok)
    got = float(logdet + quad_loglik(ms, ld, wj))
    params = unpack_theta(jnp.asarray(theta), tspec.spec)
    C = np.asarray(pairwise_cov(jnp.asarray(coords), jnp.asarray(mv),
                                jnp.asarray(coords), jnp.asarray(mv),
                                params, tspec.spec))
    want = _brute_ll(tree, sched, C, w)
    np.testing.assert_allclose(got, want, rtol=1e-8)
