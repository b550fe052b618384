"""Accept-aware theta step: the decision-only sweep must reproduce the full
sweep's MH decision quantities exactly, and the restructured step (factor
rebuild inside the accept branch, mcmc.make_step) must walk the same
trajectory as the legacy always-emit step.

The restructuring exists purely for speed (the ~73% rejected proposals skip
the factor emission and the cond's output forwarding, VERDICT r3 item 1), so
its gate is equivalence, not new semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spamtree_tpu.model.core import ModelStatic, sweep
from spamtree_tpu.model.mcmc import MCMCConfig, init_state, make_step
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _model(q=2, n_per_q=300, limited=False, seed=0):
    rng = np.random.default_rng(seed)
    n = q * n_per_q
    coords = rng.uniform(size=(n, 2))
    mv = np.repeat(np.arange(q), n_per_q)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    y = rng.normal(size=n)
    y[rng.random(n) < 0.12] = np.nan  # prediction blocks exist
    X = rng.normal(size=(n, 2))
    tree = make_tree(coords, np.isfinite(y), mv, axis_cell_size=4, K=2,
                     limited_tree=limited, rng=np.random.default_rng(seed))
    sched = build_schedule(tree, limited_tree=limited)
    tspec = make_theta_spec(2, q)
    ms = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=jnp.float64)
    return ms, tspec


@pytest.mark.parametrize("limited", [False, True], ids=["full", "limited"])
def test_decision_sweep_matches_full(limited):
    """decision_only returns the full sweep's (logdet, ok, q_new, q_cur)
    bit-for-bit at a NONZERO w (the H-free _hw_from_M and sum_p M^2 forms
    are algebraic identities, not approximations)."""
    ms, tspec = _model(limited=limited)
    cfg = MCMCConfig()
    st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    w = jnp.asarray(
        np.random.default_rng(3).normal(size=ms.n + 1)
    ).at[ms.n].set(0.0)
    th2 = st.theta * 1.05
    full = jax.jit(
        lambda: sweep(ms, th2, w, quad_prev=st.leveldata)
    )()
    dec = jax.jit(
        lambda: sweep(ms, th2, w, quad_prev=st.leveldata, decision_only=True)
    )()
    assert bool(full[3]) and bool(dec[1])
    np.testing.assert_allclose(np.asarray(dec[0]), np.asarray(full[2]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dec[2]), np.asarray(full[4]),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dec[3]), np.asarray(full[5]),
                               rtol=1e-10)
    assert np.asarray(dec[2]) != 0.0 and np.asarray(dec[3]) != 0.0


@pytest.mark.parametrize("limited", [False, True], ids=["full", "limited"])
def test_accept_aware_step_matches_legacy(limited):
    """30 transitions under the same RNG stream: the accept-aware step and
    the legacy always-emit step must produce the same chain (theta, w,
    logdetCi, factors) and the same acceptance counts -- including both
    accepted and rejected proposals along the way."""
    ms, tspec = _model(limited=limited)
    cfg = MCMCConfig()
    st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    outs = {}
    for name, aa in (("aware", True), ("legacy", False)):
        step = make_step(ms, tspec.bounds, cfg._replace(accept_aware=aa))

        @jax.jit
        def run(s, keys, step=step):
            return jax.lax.scan(
                lambda ss, k: (step(ss, k, True), None), s, keys
            )[0]

        keys = jax.random.split(jax.random.PRNGKey(7), 30)
        outs[name] = run(st, keys)
    a, b = outs["aware"], outs["legacy"]
    acc = float(a.ram.accept_count)
    assert 0 < acc < 30, acc  # both branches actually exercised
    assert float(b.ram.accept_count) == acc
    for name in ("theta", "w", "logdetCi", "beta", "tausq_inv"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            rtol=1e-9, atol=1e-11, err_msg=name,
        )
    for x, y in zip(jax.tree.leaves(a.leveldata), jax.tree.leaves(b.leveldata)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-9, atol=1e-11)
    for x, y in zip(jax.tree.leaves(a.pred_data), jax.tree.leaves(b.pred_data)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-9, atol=1e-11)
