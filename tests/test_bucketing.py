"""Thin-level size bucketing must be a pure layout change: identical
likelihood, identical samples.  (Thin levels never serve as parents, so
regrouping their blocks into per-size batches only removes padding; the
leftover 1-NN level's sizes are long-tailed, ~4x padded waste at defaults.)"""

import jax
import jax.numpy as jnp
import numpy as np

from spamtree_tpu.model.core import ModelStatic, quad_loglik, sweep
from spamtree_tpu.model.mcmc import MCMCConfig, init_state, make_step
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _pair(n=2400, q=2, seed=9, merge=(False, False), bucket=(False, True),
          align=(False, False)):
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(n // q, 2))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), n // q)
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    na = rng.uniform(size=n) > 0.15
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = rng.normal(size=(n, 2))
    tree = make_tree(coords, na, mv, axis_cell_size=4, K=2,
                     rng=np.random.default_rng(seed))
    tspec = make_theta_spec(2, q)
    out = []
    for bk, mg, al in zip(bucket, merge, align):
        sched = build_schedule(tree, bucket_thin=bk, merge_thin=mg,
                               align_thin=al, align_min_p=0)
        out.append(ModelStatic(sched, coords, mv, y, X, tspec.spec,
                               dtype=jnp.float64))
    return out[0], out[1], tspec


def test_bucketing_changes_layout():
    ms0, ms1, _ = _pair()
    # the leftover level must actually have been split (else the test is vacuous)
    assert len(ms1.levels) > len(ms0.levels)


def test_bucketed_likelihood_matches():
    ms0, ms1, tspec = _pair()
    th = jnp.asarray(tspec.start, jnp.float64)
    rng = np.random.default_rng(2)
    w = jnp.asarray(np.append(rng.normal(size=ms0.n) * 0.4, 0.0))
    ld0, _, logdet0, ok0 = jax.jit(lambda t: sweep(ms0, t, w))(th)
    ld1, _, logdet1, ok1 = jax.jit(lambda t: sweep(ms1, t, w))(th)
    assert bool(ok0) and bool(ok1)
    np.testing.assert_allclose(float(logdet0), float(logdet1), rtol=1e-12)
    q0 = float(quad_loglik(ms0, ld0, w))
    q1 = float(quad_loglik(ms1, ld1, w))
    np.testing.assert_allclose(q0, q1, rtol=1e-11)


def test_bucketed_sharded_step_matches():
    """Bucketed thin levels + whole-block padding + mesh sharding compose:
    the sharded step on the bucketed layout equals the unsharded one."""
    from spamtree_tpu.parallel.sharding import make_mesh, shard_model
    from spamtree_tpu.tree.partition import make_tree as _mt

    rng = np.random.default_rng(9)
    base = rng.uniform(size=(1200, 2))
    coords = np.repeat(base, 2, axis=0)
    mv = np.tile(np.arange(2), 1200)
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    na = rng.uniform(size=n) > 0.15
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = rng.normal(size=(n, 2))
    tree = _mt(coords, na, mv, axis_cell_size=4, K=2,
               rng=np.random.default_rng(9))
    sched = build_schedule(tree, bucket_thin=True)
    tspec = make_theta_spec(2, 2)
    cfg = MCMCConfig(keep=2, burn=1)
    key = jax.random.PRNGKey(5)

    outs = []
    for sharded in (False, True):
        ms = ModelStatic(sched, coords, mv, y, X, tspec.spec,
                         dtype=jnp.float64, block_multiple=8)
        if sharded:
            mesh = make_mesh(n_chains=1, n_blocks_shards=8)
            ms = shard_model(ms, mesh)
            with mesh:
                st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
                step = make_step(ms, tspec.bounds, cfg)
                out = jax.jit(lambda s, k: step(s, k, True))(st, key)
                jax.block_until_ready(out.w)
        else:
            st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
            step = make_step(ms, tspec.bounds, cfg)
            out = jax.jit(lambda s, k: step(s, k, True))(st, key)
        outs.append(out)
    np.testing.assert_allclose(np.asarray(outs[1].w), np.asarray(outs[0].w),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(outs[1].theta),
                               np.asarray(outs[0].theta), rtol=1e-10)


def test_merged_step_matches():
    """Merging thin blocks that share a deepest ref ancestor is a pure layout
    change too: blocks with the same ancestor have identical parent layouts
    and row-separable conditionals, so a full transition is bit-for-bit the
    same math (row-indexed RNG, as with bucketing)."""
    ms0, ms1, tspec = _pair(merge=(False, True), bucket=(True, True))
    assert len(ms1.levels) < len(ms0.levels) or (
        sum(l.rows.shape[0] for l in ms1.levels)
        < sum(l.rows.shape[0] for l in ms0.levels)
    )  # merging must actually regroup blocks (else vacuous)
    cfg = MCMCConfig(keep=2, burn=1)
    key = jax.random.PRNGKey(3)
    outs = []
    for ms in (ms0, ms1):
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        step = make_step(ms, tspec.bounds, cfg)
        out = jax.jit(lambda s, k: step(s, k, True))(st, key)
        outs.append(out)
    np.testing.assert_allclose(np.asarray(outs[1].w), np.asarray(outs[0].w),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(outs[1].theta),
                               np.asarray(outs[0].theta), rtol=1e-10)
    np.testing.assert_allclose(float(outs[1].logdetCi),
                               float(outs[0].logdetCi), rtol=1e-10)


def test_aligned_step_matches():
    """Parent-aligned thin/pred layout (one block per parent slot, factor
    read as a stream instead of a gather) is a pure layout change: a full
    transition is bit-for-bit identical to the merged gather layout."""
    ms0, ms1, tspec = _pair(merge=(True, True), bucket=(True, True),
                            align=(False, True))
    assert any(ms1.level_aligned) or any(ms1.pred_aligned), (
        "alignment did not activate; test is vacuous"
    )
    cfg = MCMCConfig(keep=2, burn=1)
    key = jax.random.PRNGKey(3)
    outs = []
    for ms in (ms0, ms1):
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        step = make_step(ms, tspec.bounds, cfg)
        out = jax.jit(lambda s, k: step(s, k, True))(st, key)
        outs.append(out)
    np.testing.assert_allclose(np.asarray(outs[1].w), np.asarray(outs[0].w),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(outs[1].theta),
                               np.asarray(outs[0].theta), rtol=1e-10)
    np.testing.assert_allclose(float(outs[1].logdetCi),
                               float(outs[0].logdetCi), rtol=1e-10)


def test_bucketed_step_matches():
    """A full MCMC transition is bit-for-bit the same math either way (the
    per-location RNG is row-indexed, so regrouping does not reorder draws)."""
    ms0, ms1, tspec = _pair()
    cfg = MCMCConfig(keep=2, burn=1)
    key = jax.random.PRNGKey(3)
    outs = []
    for ms in (ms0, ms1):
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        step = make_step(ms, tspec.bounds, cfg)
        out = jax.jit(lambda s, k: step(s, k, True))(st, key)
        outs.append(out)
    np.testing.assert_allclose(np.asarray(outs[1].w), np.asarray(outs[0].w),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(outs[1].theta),
                               np.asarray(outs[0].theta), rtol=1e-10)
    np.testing.assert_allclose(float(outs[1].logdetCi),
                               float(outs[0].logdetCi), rtol=1e-10)
