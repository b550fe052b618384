"""End-to-end integration tests replicating the reference's de-facto test
suite (SURVEY.md §4): runnable-example configs with simulate-and-recover
gates on RMSPE and parameter recovery."""

import numpy as np
import jax.numpy as jnp

import pytest

from spamtree_tpu import spamtree
from spamtree_tpu.utils.checkpoint import load_state, save_state


def _sim_univariate(SS=13, seed=2021):
    rng = np.random.default_rng(seed)
    n = SS * SS
    coords = rng.uniform(size=(n, 2))
    sigmasq, phi, tausq = 2.3, 6.0, 0.1
    B = np.array([-1.0, 0.5, 1.0])
    D = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    CC = sigmasq * np.exp(-phi * D)
    w = np.linalg.cholesky(CC + 1e-10 * np.eye(n)) @ rng.normal(size=n)
    X = rng.normal(size=(n, 3))
    y_full = X @ B + w + np.sqrt(tausq) * rng.normal(size=n)
    miss = rng.binomial(1, 0.1, n).astype(bool)
    y = np.where(miss, np.nan, y_full)
    return coords, X, y, y_full, w, miss, B


def test_readme_config_recovers():
    """CRAN/README univariate config: beta recovery + RMSPE beats sd(y)."""
    coords, X, y, y_full, w, miss, B = _sim_univariate()
    ybar = np.nanmean(y)
    out = spamtree(
        y - ybar, X, coords, cell_size=25,
        mcmc=dict(keep=150, burn=150, thin=1),
        dtype=jnp.float64, seed=1,
    )
    order = out["order"]
    beta_hat = out["beta_mcmc"][:, :, 0].mean(axis=1)
    assert np.abs(beta_hat - B).max() < 0.35, beta_hat
    y_post = out["yhat_mcmc"].mean(axis=0) + ybar
    mo = miss[order]
    rmspe = np.sqrt(np.mean((y_post[mo] - y_full[order][mo]) ** 2))
    assert rmspe < 0.75 * np.nanstd(y_full), rmspe
    # latent surface correlates with truth
    w_hat = out["w_mcmc"].mean(axis=0)
    cc = np.corrcoef(w_hat, w[order])[0, 1]
    assert cc > 0.85, cc
    # tausq in a sane range
    assert 0.01 < out["tausq_mcmc"].mean() < 1.0


def test_yhat_reconstruction_moments():
    """yhat is rebuilt host-side as X beta + w + tau z (mcmc._yhat_host);
    check the reconstruction against its definition: residual yhat - w - XB
    has ~N(0, tausq) per-draw moments (reference semantics,
    spamtree_fit.cpp:384)."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=11)
    out = spamtree(
        y, X, coords, mcmc=dict(keep=60, burn=60, thin=1),
        dtype=jnp.float64, seed=3,
    )
    order = out["order"]
    Xs = X[order]
    # per kept draw k: residual_k = yhat_k - w_k - X beta_k
    beta = np.moveaxis(out["beta_mcmc"], 1, 0)[:, :, 0]  # (keep, p)
    resid = out["yhat_mcmc"] - out["w_mcmc"] - beta @ Xs.T
    tau = out["tausq_mcmc"][0]  # (keep,)
    z = resid / np.sqrt(tau)[:, None]
    assert abs(z.mean()) < 0.02, z.mean()
    assert abs(z.std() - 1.0) < 0.02, z.std()


def test_debug_flags_fix_samplers():
    """Sampler ablation flags (reference: debug list, spamtree_fit.R:18-20):
    disabling a sampler freezes its state."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    out = spamtree(
        y, X, coords, mcmc=dict(keep=10, burn=5),
        starting=dict(beta=np.array([1.0, 2.0, 3.0]), tausq=0.25),
        debug=dict(sample_beta=False, sample_tausq=False, sample_theta=True,
                   sample_w=True, sample_predicts=True),
        dtype=jnp.float64,
    )
    assert np.allclose(out["beta_mcmc"][:, :, 0], [[1.0]] * 1 + [[2.0]] + [[3.0]])
    assert np.allclose(out["tausq_mcmc"], 0.25)


def test_vignette_bivariate_misaligned():
    """Vignette config: bivariate misaligned data from the exact AG10
    cross-covariance; cross-margin prediction fills the misaligned holes
    (reference: vignettes/spatial_multivariate.Rmd)."""
    import sys
    sys.path.insert(0, ".")
    from examples.bivariate_misaligned import run

    res = run(n_per_q=400, keep=80, burn=80, thin=1, verbose=False)
    assert res["w_corr"] > 0.75, res
    assert res["rmspe"] < 0.8 * res["sd_y"], res
    # 160 iterations is far below the RAM adaptation time constant at 10
    # theta-dims; just check the chain moves at all
    assert 0.003 < res["accept"] < 0.9


def test_no_missing_thinned():
    """Fully-observed data (no NA -> the prediction level is absent from
    the tree, reference: find_nan.cpp + spamtree_fit.R NA split) with
    thin=2: kept draws subsample the chain and yhat covers every row."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=11)
    out = spamtree(
        y_full, X, coords, mcmc=dict(keep=60, burn=60, thin=2),
        dtype=jnp.float64, seed=5,
    )
    assert out["yhat_mcmc"].shape == (60, len(y_full))
    assert np.isfinite(out["yhat_mcmc"]).all()
    beta_hat = out["beta_mcmc"][:, :, 0].mean(axis=1)
    assert np.abs(beta_hat - B).max() < 0.35, beta_hat
    w_hat = out["w_mcmc"].mean(axis=0)
    cc = np.corrcoef(w_hat, w[out["order"]])[0, 1]
    assert cc > 0.85, cc


@pytest.mark.parametrize("kw", [
    dict(K=3),
    dict(start_level=1, tree_depth=3),
    dict(tree_depth=2, last_not_reference=False),
    dict(limited_tree=True),
    dict(cherrypick_same_margin=False, cherrypick_group_locations=False),
], ids=["K3", "start_level", "shallow_all_ref", "limited", "no_cherrypick"])
def test_tree_knob_configs(kw):
    """Tree-shape knobs through the PUBLIC API (reference make_tree.R
    surface): every combination must run end-to-end and beat the trivial
    predictor on held-out rows."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=11)
    out = spamtree(y, X, coords, cell_size=9,
                   mcmc=dict(keep=30, burn=30), dtype=jnp.float64, seed=3,
                   **kw)
    order = out["order"]
    assert out["yhat_mcmc"].shape == (30, len(y))
    assert np.isfinite(out["yhat_mcmc"]).all()
    yp = out["yhat_mcmc"].mean(axis=0)
    mo = miss[order]
    rmspe = np.sqrt(np.mean((yp[mo] - y_full[order][mo]) ** 2))
    assert rmspe < np.nanstd(y_full), (kw, rmspe)


def test_multiinput_4d_domain():
    """dd=4 input domain routes to the nonspatial anisotropic exponential
    kernel (model 0; reference spamtree_fit.R:141-157) through the public
    API: partitioner, schedule and sampler are dimension-generic."""
    rng = np.random.default_rng(5)
    n = 600
    coords = rng.uniform(size=(n, 4))
    w = np.sin(3 * coords[:, 0]) * np.cos(2 * coords[:, 1]) \
        + 0.5 * coords[:, 2]
    X = rng.normal(size=(n, 2))
    y_full = X @ np.array([0.5, -1.0]) + w + 0.1 * rng.normal(size=n)
    y = y_full.copy()
    miss = rng.uniform(size=n) < 0.1
    y[miss] = np.nan
    out = spamtree(y, X, coords, cell_size=16, mcmc=dict(keep=50, burn=50),
                   dtype=jnp.float64, seed=2)
    order = out["order"]
    beta_hat = out["beta_mcmc"][:, :, 0].mean(axis=1)
    assert np.abs(beta_hat - [0.5, -1.0]).max() < 0.2, beta_hat
    yp = out["yhat_mcmc"].mean(axis=0)
    mo = miss[order]
    rmspe = np.sqrt(np.mean((yp[mo] - y_full[order][mo]) ** 2))
    assert rmspe < 0.5 * np.std(y_full), rmspe
    w_hat = out["w_mcmc"].mean(axis=0)
    assert np.corrcoef(w_hat, w[order])[0, 1] > 0.9


def test_checkpoint_run_and_unknown_knob(tmp_path):
    """checkpoint_path= engages the non-pipelined drain (save after every
    chunk) and writes a loadable state file; and a typo'd knob dict key
    raises instead of silently running with defaults."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    ck = str(tmp_path / "run_ck.npz")
    out = spamtree(
        y, X, coords, mcmc=dict(keep=20, burn=10), checkpoint_path=ck,
        dtype=jnp.float64, seed=7,
    )
    assert out["yhat_mcmc"].shape[0] == 20
    import os
    assert os.path.exists(ck)
    with np.load(ck) as z:
        assert "theta" in z and "w" in z
    with pytest.raises(ValueError, match="settings"):
        spamtree(y, X, coords, settings=dict(checkpoint=ck))
    with pytest.raises(ValueError, match="mcmc"):
        spamtree(y, X, coords, mcmc=dict(keep=5, burnin=5))


def test_pipelined_equals_sequential_drain(tmp_path):
    """Sample equality between the pipelined drain (default) and the
    sequential drain (engaged by checkpoint_path): the overlap is pure
    scheduling, draws must be bit-identical."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    kw = dict(mcmc=dict(keep=30, burn=10), dtype=jnp.float64, seed=11)
    a = spamtree(y, X, coords, **kw)
    b = spamtree(y, X, coords,
                 checkpoint_path=str(tmp_path / "ck.npz"), **kw)
    for k in ("w_mcmc", "beta_mcmc", "tausq_mcmc", "theta_mcmc"):
        assert np.array_equal(a[k], b[k]), k


def test_resume_from_checkpoint(tmp_path):
    """resume_from= continues an interrupted run through the public API:
    run A keeps 30 of 60 with checkpointing; run B resumes with the SAME
    knobs and returns the remaining 30.  Checkpoints land on chunk
    boundaries and carry the post-chunk RNG key, so A + B's draws must be
    bit-identical to an uninterrupted 60-keep run (w/beta/tausq/theta;
    yhat re-seeds its host noise stream on resume and is excluded)."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    kw = dict(dtype=jnp.float64, seed=13, settings=dict(chunk=10))
    full = spamtree(y, X, coords, mcmc=dict(keep=60, burn=20), **kw)
    ck = str(tmp_path / "ck.npz")
    part = spamtree(y, X, coords, mcmc=dict(keep=30, burn=20),
                    checkpoint_path=ck, **kw)
    res = spamtree(y, X, coords, mcmc=dict(keep=60, burn=20),
                   resume_from=ck, **kw)
    assert res["resumed_at_iteration"] == 20 + 30
    assert res["resumed_kept_already"] == 30
    assert res["w_mcmc"].shape[0] == 30
    # part draws == full's first 30; resumed draws == full's last 30
    assert np.array_equal(part["w_mcmc"], full["w_mcmc"][:30])
    assert np.array_equal(res["w_mcmc"], full["w_mcmc"][30:])
    assert np.array_equal(res["theta_mcmc"], full["theta_mcmc"][:, 30:])
    assert np.array_equal(res["beta_mcmc"], full["beta_mcmc"][:, 30:])
    assert np.array_equal(res["tausq_mcmc"], full["tausq_mcmc"][:, 30:])
    # a checkpoint that already holds every requested draw refuses to resume
    with pytest.raises(ValueError, match="nothing to resume"):
        spamtree(y, X, coords, mcmc=dict(keep=30, burn=20),
                 resume_from=ck, **kw)
    # chain-count mismatch is caught before any sampling
    with pytest.raises(ValueError, match="chain"):
        spamtree(y, X, coords, mcmc=dict(keep=60, burn=20), n_chains=2,
                 resume_from=ck, **kw)
    # thin mismatch is rejected: iterations per chunk are mc*thin, so a
    # different thin would shift burn_actual and the chunk/RNG boundaries
    with pytest.raises(ValueError, match="thin"):
        spamtree(y, X, coords, mcmc=dict(keep=60, burn=20, thin=2),
                 resume_from=ck, **kw)


def test_resume_mid_burn_and_chains(tmp_path):
    """Resume from a checkpoint taken DURING burn (remaining burn is skipped
    past exactly), and the multi-chain analog: both must reproduce the
    uninterrupted run's draws bit-for-bit."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    kw = dict(dtype=jnp.float64, seed=17, settings=dict(chunk=10))
    # mid-burn: run A does only 10 of 30 burn iterations (keep=0 would skip
    # the burn loop, so take 0 kept chunks by interrupt-free construction:
    # burn=10 keep=30 checkpointed, then resume asking burn=30)
    ck = str(tmp_path / "ck_burn.npz")
    full = spamtree(y, X, coords, mcmc=dict(keep=20, burn=30), **kw)
    spamtree(y, X, coords, mcmc=dict(keep=0, burn=10), checkpoint_path=ck,
             settings=dict(chunk=10, lazy_init=True), dtype=jnp.float64,
             seed=17)
    res = spamtree(y, X, coords, mcmc=dict(keep=20, burn=30),
                   resume_from=ck, **kw)
    assert res["resumed_at_iteration"] == 10
    assert res["resumed_kept_already"] == 0
    assert np.array_equal(res["w_mcmc"], full["w_mcmc"])
    assert np.array_equal(res["theta_mcmc"], full["theta_mcmc"])
    # a keep=0 run can EXTEND the burn from the same checkpoint (resume must
    # not refuse on kept_already >= keep == 0 while burn remains)
    r0 = spamtree(y, X, coords, mcmc=dict(keep=0, burn=20), resume_from=ck,
                  checkpoint_path=ck, settings=dict(chunk=10, lazy_init=True),
                  dtype=jnp.float64, seed=17)
    assert r0["resumed_at_iteration"] == 10 and r0["burn_actual"] == 10
    with np.load(ck) as z:
        assert int(np.asarray(z["it"]).ravel()[0]) == 20
    # multi-chain: 2 chains, resume after half the keeps
    kw2 = dict(dtype=jnp.float64, seed=23, settings=dict(chunk=10),
               n_chains=2)
    ck2 = str(tmp_path / "ck_chains.npz")
    full2 = spamtree(y, X, coords, mcmc=dict(keep=20, burn=10), **kw2)
    spamtree(y, X, coords, mcmc=dict(keep=10, burn=10),
             checkpoint_path=ck2, **kw2)
    res2 = spamtree(y, X, coords, mcmc=dict(keep=20, burn=10),
                    resume_from=ck2, **kw2)
    assert res2["resumed_kept_already"] == 10
    assert res2["w_mcmc"].shape == (10, 2, len(y))
    assert np.array_equal(res2["w_mcmc"], full2["w_mcmc"][10:])
    assert np.array_equal(res2["theta_mcmc"], full2["theta_mcmc"][10:])


def test_resume_repins_original_chunk_size(tmp_path):
    """keep=10/chunk=4 balances to mc=4 (chunks 4, 4, 2-masked); resuming
    after 4 kept draws leaves 6, which would RE-balance to mc=3 and shift
    every later chunk boundary -- and with them the per-chunk RNG splits --
    off the uninterrupted run's.  The resume path must pin the
    continuation to the original run's mc (cfg.mc_fixed) so the remaining
    draws stay bit-identical."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    kw = dict(dtype=jnp.float64, seed=31, settings=dict(chunk=4))
    full = spamtree(y, X, coords, mcmc=dict(keep=10, burn=10), **kw)
    ck = str(tmp_path / "ck.npz")
    spamtree(y, X, coords, mcmc=dict(keep=4, burn=10), checkpoint_path=ck,
             **kw)
    res = spamtree(y, X, coords, mcmc=dict(keep=10, burn=10),
                   resume_from=ck, **kw)
    assert res["resumed_kept_already"] == 4
    assert np.array_equal(res["w_mcmc"], full["w_mcmc"][4:])
    # single-chain theta/tausq use the reference's (n_params, keep) layout
    assert np.array_equal(res["theta_mcmc"], full["theta_mcmc"][:, 4:])
    assert np.array_equal(res["beta_mcmc"], full["beta_mcmc"][:, 4:])


def test_resume_extends_keep_across_different_geometry(tmp_path):
    """Resume asking for MORE keep than the checkpoint run: the two runs'
    keep values balance to different chunk sizes (keep=6/chunk=4 -> mc=3;
    keep=12/chunk=4 -> mc=4), so inferring the original geometry from the
    RESUME call's config would mis-place burn_actual and silently
    mis-count kept_already.  The checkpoint now stores the writing run's
    (mc, burn_done, kept_done); the continuation must count exactly and
    bit-match a full run that uses the writing run's chunk size."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    ck = str(tmp_path / "ck.npz")
    kw = dict(dtype=jnp.float64, seed=37)
    spamtree(y, X, coords, mcmc=dict(keep=6, burn=6),
             settings=dict(chunk=4), checkpoint_path=ck, **kw)
    res = spamtree(y, X, coords, mcmc=dict(keep=12, burn=6),
                   settings=dict(chunk=4), resume_from=ck, **kw)
    assert res["resumed_kept_already"] == 6
    assert res["w_mcmc"].shape[0] == 6  # exactly the 6 NEW draws
    # chunk=3 gives the uninterrupted run the writing run's mc=3 geometry
    full = spamtree(y, X, coords, mcmc=dict(keep=12, burn=6),
                    settings=dict(chunk=3), **kw)
    assert np.array_equal(res["w_mcmc"], full["w_mcmc"][6:])
    assert np.array_equal(res["theta_mcmc"], full["theta_mcmc"][:, 6:])


def test_resume_burn_prime_different_keep(tmp_path):
    """Burn-prime (keep=0) checkpoint resumed with keep>0: the writing
    run's burn rounded up to ITS chunks (burn=9 -> 12 at mc=chunk=4); the
    resume must see all 12 burn iterations as done (stored burn_done)
    instead of re-deriving a smaller burn_actual from its own geometry and
    mistaking the surplus burn for kept draws."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    ck = str(tmp_path / "ck.npz")
    kw = dict(dtype=jnp.float64, seed=41, settings=dict(chunk=4))
    spamtree(y, X, coords, mcmc=dict(keep=0, burn=9), checkpoint_path=ck,
             **kw)
    res = spamtree(y, X, coords, mcmc=dict(keep=6, burn=9),
                   resume_from=ck, **kw)
    assert res["resumed_kept_already"] == 0
    assert res["burn_actual"] == 0  # all burn already done, none repeated
    assert res["w_mcmc"].shape[0] == 6
    assert np.isfinite(res["w_mcmc"]).all()


def test_resume_chained_counts_survive(tmp_path):
    """Chained resumes must carry the TRUE cumulative counts.  (a) A
    burn-extension resume asking for FEWER keeps than already taken must
    not shrink the stored kept_done (the extra draws live in earlier
    results/sinks; clipping would orphan them for the next resume).
    (b) A keep=0 (burn-only) continuation must honor the writing run's
    chunk-size pin -- chunk_sizes' keep==0 branch used to fall back to
    cfg.chunk, storing a wrong mc for every later resume."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    kw = dict(dtype=jnp.float64, seed=43)
    ck = str(tmp_path / "ck.npz")
    # writing run: keep=10/chunk=5 -> mc=5; burn=4 rounds up to one
    # 5-iteration chunk (burn_done=5)
    spamtree(y, X, coords, mcmc=dict(keep=10, burn=4),
             settings=dict(chunk=5), checkpoint_path=ck, **kw)
    with np.load(ck) as z:
        assert tuple(z["geom_counts"]) == (5, 5, 10, 1)
    # burn-extension resume with keep=6 < kept_done=10 and a DIFFERENT
    # chunk setting: burn-only continuation (rem_burn = 15-5 = 10 under
    # the pinned ipc=5), whose checkpoints must keep kept_done=10 and mc=5
    r1 = spamtree(y, X, coords, mcmc=dict(keep=6, burn=15),
                  settings=dict(chunk=3), resume_from=ck,
                  checkpoint_path=ck, **kw)
    assert r1["burn_actual"] == 10 and r1["w_mcmc"].shape[0] == 0
    with np.load(ck) as z:
        assert tuple(z["geom_counts"]) == (5, 15, 10, 1)
    # final resume: all burn done, draws 2 more keeps on the mc=5 grid
    r2 = spamtree(y, X, coords, mcmc=dict(keep=12, burn=15),
                  settings=dict(chunk=3), resume_from=ck, **kw)
    assert r2["resumed_kept_already"] == 10
    assert r2["burn_actual"] == 0
    assert r2["w_mcmc"].shape[0] == 2
    assert np.isfinite(r2["w_mcmc"]).all()


def test_resume_sink_append(tmp_path):
    """A resumed run pointed at the same sink_dir APPENDS to the existing
    sink files (truncating would destroy the interrupted run's draws): the
    final file holds all keep draws, identical to an uninterrupted run."""
    import os

    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    n = len(y)
    kw = dict(dtype=jnp.float64, seed=29, settings=dict(chunk=10))
    ck = str(tmp_path / "ck.npz")
    sd = str(tmp_path / "sink")
    sf = str(tmp_path / "sink_full")
    spamtree(y, X, coords, mcmc=dict(keep=20, burn=10), sink_dir=sf, **kw)
    spamtree(y, X, coords, mcmc=dict(keep=10, burn=10), checkpoint_path=ck,
             sink_dir=sd, **kw)
    spamtree(y, X, coords, mcmc=dict(keep=20, burn=10), resume_from=ck,
             sink_dir=sd, **kw)
    got = np.fromfile(os.path.join(sd, "w_mcmc.f32"), dtype=np.float32)
    want = np.fromfile(os.path.join(sf, "w_mcmc.f32"), dtype=np.float32)
    assert got.size == 20 * n
    assert np.array_equal(got, want)

    # the reader memory-maps the draws back with the right shape
    from spamtree_tpu.utils.native import read_sink

    draws = read_sink(os.path.join(sd, "w_mcmc.f32"), n)
    assert draws.shape == (20, n)
    assert np.array_equal(np.asarray(draws).ravel(), want)
    with pytest.raises(ValueError, match="whole number"):
        read_sink(os.path.join(sd, "w_mcmc.f32"), n + 1)


def test_lazy_init_explicit_requires_burn_and_theta():
    """Explicit settings['lazy_init']=True without burn>=1 + sample_theta
    would silently run on zero factors; it must raise instead."""
    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    with pytest.raises(ValueError, match="lazy_init"):
        spamtree(y, X, coords, mcmc=dict(keep=5, burn=0),
                 settings=dict(lazy_init=True))
    with pytest.raises(ValueError, match="lazy_init"):
        spamtree(y, X, coords, mcmc=dict(keep=5, burn=5),
                 settings=dict(lazy_init=True),
                 debug=dict(sample_theta=False))


def test_checkpoint_roundtrip(tmp_path):
    from spamtree_tpu.model.core import ModelStatic
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    rng = np.random.default_rng(0)
    n = 150
    coords = rng.uniform(size=(n, 2))
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    y = rng.normal(size=n)
    X = np.ones((n, 1))
    tree = make_tree(coords, np.ones(n, bool), np.zeros(n, np.int64),
                     axis_cell_size=4, K=2, rng=rng)
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 1)
    ms = ModelStatic(sched, coords, np.zeros(n, np.int64), y, X, tspec.spec,
                     dtype=jnp.float64)
    st = init_state(ms, tspec.bounds, tspec.start, cfg=MCMCConfig(), seed=4)
    p = str(tmp_path / "ck.npz")
    save_state(p, st)
    st2 = load_state(p, ms)
    assert np.allclose(np.asarray(st.w), np.asarray(st2.w))
    assert np.allclose(np.asarray(st.theta), np.asarray(st2.theta))
    assert np.allclose(np.asarray(st.logdetCi), np.asarray(st2.logdetCi))
    assert np.allclose(np.asarray(st.ram.paramsd), np.asarray(st2.ram.paramsd))
    # leveldata rebuilt from theta matches
    for a, b in zip(st.leveldata, st2.leveldata):
        assert np.allclose(np.asarray(a.H), np.asarray(b.H))
        assert np.allclose(np.asarray(a.prec), np.asarray(b.prec))


def test_tuner_overlap_thread():
    """settings["tuner_overlap"]=True runs the CPU curvature tuner in a
    background thread joined by the drivers' pre_burn_hook (on remote-compile
    backends this hides the tuner inside the compile wait; auto-off on local
    CPU).  The patched RAM proposal must equal what ram_init builds from the
    same covariance, and the threaded run must mix."""
    import jax.numpy as jnp

    from spamtree_tpu.model.ram import ram_init, ram_set_proposal

    rng = np.random.default_rng(4)
    cov = np.diag(rng.uniform(1e-4, 0.05, size=4))
    a = ram_init(jnp.asarray(cov))
    b = ram_set_proposal(ram_init(jnp.asarray(np.eye(4) * 0.01)), cov)
    np.testing.assert_allclose(np.asarray(b.paramsd), np.asarray(a.paramsd),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b.prodparam),
                               np.asarray(a.prodparam), rtol=1e-12)

    n = 300
    coords = rng.uniform(size=(n, 2))
    X = rng.normal(size=(n, 2))
    y = X @ np.array([1.0, -0.5]) + rng.normal(size=n)
    y[rng.uniform(size=n) < 0.1] = np.nan
    res = spamtree(y, X, coords, cell_size=16, K=2,
                   mcmc=dict(keep=40, burn=40), seed=2,
                   settings=dict(tuner_overlap=True))
    tb = res["setup_breakdown"]
    assert "tuner_join_wait_s" in tb and "cpu_tuner_s" in tb
    assert np.isfinite(res["w_mcmc"]).all()
    assert 0.05 < res["accept_ratio"] < 0.95

    # the hook also patches STACKED chain states on a device mesh (the
    # broadcast over the chain lead axis + sharding-preserving device_put)
    import jax

    res2 = spamtree(y, X, coords, cell_size=16, K=2,
                    mcmc=dict(keep=20, burn=20), seed=2, n_chains=2,
                    devices=jax.devices(),
                    settings=dict(tuner_overlap=True))
    assert "tuner_join_wait_s" in res2["setup_breakdown"]
    assert res2["w_mcmc"].shape[1] == 2
    assert np.isfinite(res2["w_mcmc"]).all()
    assert not np.allclose(res2["w_mcmc"][:, 0], res2["w_mcmc"][:, 1])


def test_tiny_n_degenerate_sizes():
    """Very small n through the full API: single-block trees, blocks smaller
    than cell_size, near-empty levels -- the padding/edge geometry must
    produce finite mixing chains."""
    rng = np.random.default_rng(0)
    for n, cell in [(30, 25), (12, 4)]:
        coords = rng.uniform(size=(n, 2))
        X = rng.normal(size=(n, 1))
        y = X[:, 0] + rng.normal(size=n) * 0.3
        y[rng.uniform(size=n) < 0.15] = np.nan
        r = spamtree(y, X, coords, cell_size=cell, K=2,
                     mcmc=dict(keep=8, burn=4), dtype=jnp.float64, seed=1)
        assert r["w_mcmc"].shape == (8, n)
        assert np.isfinite(r["w_mcmc"]).all()
        assert np.isfinite(r["yhat_mcmc"]).all()


def test_float64_requires_x64_mode():
    """dtype=float64 without jax_enable_x64 must raise instead of silently
    truncating every array to float32 (checked in a subprocess: the suite
    itself runs with x64 on)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from spamtree_tpu import spamtree\n"
        "try:\n"
        "    spamtree(np.ones(8), np.ones((8,1)),"
        " np.random.default_rng(0).uniform(size=(8,2)),"
        " mcmc=dict(keep=2,burn=1), dtype=jnp.float64)\n"
        "except ValueError as e:\n"
        "    assert 'x64' in str(e); print('GUARD_OK')\n"
    )
    env = {k: v for k, v in __import__('os').environ.items()
           if k != "JAX_ENABLE_X64"}
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300, cwd="/root/repo", env=env)
    assert "GUARD_OK" in out.stdout, (out.stdout, out.stderr[-500:])


def test_chains_sink_roundtrip(tmp_path):
    """Multi-chain draws stream to sinks with the chain axis intact:
    read_sink(n_chains=C) reproduces the in-RAM run's draws (sink files are
    float32 by design)."""
    import os

    from spamtree_tpu.utils.native import read_sink

    coords, X, y, y_full, w, miss, B = _sim_univariate(SS=9)
    n = len(y)
    kw = dict(dtype=jnp.float64, seed=31, n_chains=2,
              settings=dict(chunk=5, wire_dtype="none"),
              mcmc=dict(keep=10, burn=5))
    ram = spamtree(y, X, coords, **kw)
    sd = str(tmp_path / "sink")
    spamtree(y, X, coords, sink_dir=sd, **kw)
    draws = read_sink(os.path.join(sd, "w_mcmc.f32"), n, n_chains=2)
    assert draws.shape == (10, 2, n)
    np.testing.assert_allclose(np.asarray(draws), ram["w_mcmc"],
                               rtol=1e-6, atol=1e-6)


def test_interval_coverage_calibration():
    """Posterior credible intervals are calibrated: over replicates
    simulated from the exact generative model, pooled 90% intervals for
    the latent w (observed rows) and the posterior-predictive yhat
    (held-out rows) cover the truth at ~nominal rate.  This is the
    reference's simulate-and-recover validation (man/spamtree.Rd:128-208)
    made quantitative -- a biased sampler shows systematic under- or
    over-coverage.  Bounds are generous for R=6 replicates (within-
    replicate spatial correlation shrinks the effective sample)."""
    from examples.coverage_sim import run

    res = run(R=6, n=300, keep=250, burn=250, level=0.9, seed0=500)
    assert 0.78 <= res["w_coverage"] <= 0.99, res
    assert 0.78 <= res["yhat_coverage"] <= 0.99, res
    # beta: 12 indicator draws; require no gross miscalibration
    assert min(res["beta_coverage"]) >= 0.5, res


def test_elevation_through_front_end():
    """elevation=True reaches covariance model 2 (AG10 + elevation) through
    the public spamtree() surface -- a path the reference implements
    (covariance_functions.cpp:138-209) but whose front-end rejects dd==3
    before dispatch (spamtree_fit.R:59-62).  Simulate from an
    elevation-modulated GP and check recovery beats the trivial predictor."""
    rng = np.random.default_rng(7)
    n = 320
    coords = np.column_stack([
        rng.uniform(size=(n, 2)), 0.3 * rng.uniform(size=n)
    ])
    D2 = np.linalg.norm(coords[:, None, :2] - coords[None, :, :2], axis=-1)
    De = np.abs(coords[:, None, 2] - coords[None, :, 2])
    CC = 1.8 * np.exp(-5.0 * D2 - 2.0 * De)
    w = np.linalg.cholesky(CC + 1e-8 * np.eye(n)) @ rng.normal(size=n)
    X = rng.normal(size=(n, 2))
    B = np.array([1.0, -0.5])
    y_full = X @ B + w + np.sqrt(0.05) * rng.normal(size=n)
    miss = rng.binomial(1, 0.12, n).astype(bool)
    y = np.where(miss, np.nan, y_full)
    out = spamtree(y, X, coords, elevation=True, cell_size=16,
                   mcmc=dict(keep=120, burn=120), dtype=jnp.float64, seed=3)
    # model 2's theta layout: ai1, ai2, phi, thetamv(1), d_elevation for q=1
    assert out["theta_mcmc"].shape[0] == 5
    order = out["order"]
    mo = miss[order]
    rmspe = np.sqrt(np.mean(
        (out["yhat_mcmc"].mean(axis=0)[mo] - y_full[order][mo]) ** 2))
    assert rmspe < 0.75 * np.nanstd(y_full), rmspe
    # dd=3 without the knob dispatches the nonspatial kernel; with a wrong
    # dd the knob raises
    with pytest.raises(ValueError, match="elevation"):
        spamtree(y, X, coords[:, :2], elevation=True,
                 mcmc=dict(keep=2, burn=0))
