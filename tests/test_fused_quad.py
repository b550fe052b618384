"""The quadratic forms fused into the proposal sweep must equal the
standalone quad_loglik passes they replaced (reference computes wcore inside
its sweep, spamtree_model.cpp:912-914; here both the proposal's and the
current state's quads ride the same level loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spamtree_tpu.model.core import ModelStatic, quad_loglik, sweep
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


@pytest.mark.parametrize("limited", [False, True], ids=["full", "limited"])
def test_fused_quads_match_standalone(limited):
    rng = np.random.default_rng(4)
    q = 2
    base = rng.uniform(size=(150, 2))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), 150)
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    na = rng.uniform(size=n) > 0.1
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = rng.normal(size=(n, 2))
    tree = make_tree(coords, na, mv, axis_cell_size=4, K=2, rng=rng,
                     limited_tree=limited)
    sched = build_schedule(tree, limited_tree=limited)
    tspec = make_theta_spec(2, q)
    ms = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=jnp.float64)

    theta1 = jnp.asarray(tspec.start, jnp.float64)
    theta2 = theta1 * 1.15
    w = jnp.asarray(np.append(rng.normal(size=n) * 0.4, 0.0))

    ld1, _, _, ok1 = jax.jit(lambda t: sweep(ms, t, w))(theta1)
    new_ld, _, _, ok2, q_new, q_cur = jax.jit(
        lambda t: sweep(ms, t, w, quad_prev=ld1)
    )(theta2)
    assert bool(ok1) and bool(ok2)

    q_cur_ref = quad_loglik(ms, ld1, w)
    q_new_ref = quad_loglik(ms, new_ld, w)
    np.testing.assert_allclose(float(q_cur), float(q_cur_ref), rtol=1e-10)
    np.testing.assert_allclose(float(q_new), float(q_new_ref), rtol=1e-10)
