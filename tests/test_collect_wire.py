"""Round-3 output-path features: device-side summary accumulation,
device->host wire dtype, and single-program burn rounding.

The reference streams every kept draw into host-side cubes inside the
sampler driver (reference: src/spamtree_fit.cpp:376-389).  At n ~ 1e6 that
is O(keep * n) bytes through a ~20 MB/s device->host relay, so the rebuild
adds (a) ``collect="summary"``: running mean/M2 accumulated ON DEVICE, O(n)
shipped once at the end, and (b) a float16 wire format for w draws (f16's
2^-11 relative error is far below posterior MC noise).  These tests pin
that both paths are exact (summary) or within wire precision (f16) of the
default path, chunk geometry included.
"""

import jax.numpy as jnp
import numpy as np

from spamtree_tpu.api import spamtree


def _data(n=260, seed=11):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    X = rng.normal(size=(n, 2))
    w = np.sin(coords @ np.array([6.0, 4.0]))
    y = X @ np.array([1.0, -0.5]) + w + 0.1 * rng.normal(size=n)
    y[rng.uniform(size=n) < 0.1] = np.nan
    return y, X, coords


KW = dict(cell_size=16, K=2, seed=7, verbose=False)


def test_summary_moments_match_draws():
    """collect="summary" must reproduce exactly the moments of the draws the
    default path ships: same seed => same trajectory => w_mean/w_var equal
    the host-side mean/var of w_mcmc (float64, wire off => bit-comparable)."""
    # chunk=10 with keep=24 leaves a TRUNCATED final chunk (take=4): its
    # discarded tail transitions must not leak into the device moments
    # (regression: summary_count was 30 != keep=24 before the flag mask)
    mcmc = dict(keep=24, burn=8, thin=1)
    ra = spamtree(*_data(), mcmc=mcmc, dtype=jnp.float64,
                  settings=dict(wire_dtype="none", chunk=10), **KW)
    rs = spamtree(*_data(), mcmc=mcmc, dtype=jnp.float64,
                  settings=dict(wire_dtype="none", collect="summary",
                                chunk=10), **KW)

    assert rs["w_mcmc"].shape[0] == 0  # no draw cubes in summary mode
    assert rs["summary_count"] == 24 == ra["w_mcmc"].shape[0]
    np.testing.assert_allclose(rs["w_mean"], ra["w_mcmc"].mean(0),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(rs["w_var"], ra["w_mcmc"].var(0),
                               rtol=1e-7, atol=1e-11)
    # yhat adds fresh observation noise (device RNG in summary mode, host
    # RNG in draw mode): means agree within the noise-of-the-mean envelope
    tau = float(np.mean(ra["tausq_mcmc"]))
    m = ra["yhat_mcmc"].shape[0]
    tol = 6.0 * np.sqrt(tau / m)
    np.testing.assert_allclose(rs["yhat_mean"], ra["yhat_mcmc"].mean(0),
                               atol=tol)
    # small params are always shipped as full draws
    assert rs["theta_mcmc"].shape == ra["theta_mcmc"].shape
    np.testing.assert_allclose(rs["theta_mcmc"], ra["theta_mcmc"], rtol=1e-9)


def test_summary_mode_chains():
    """Summary accumulators carry a chain axis under the vmapped driver."""
    # chunk=5 -> balanced mc=5, takes (5, 4): truncated final chunk
    mcmc = dict(keep=9, burn=4, thin=1)
    r = spamtree(*_data(n=200), mcmc=mcmc, n_chains=2,
                 settings=dict(collect="summary", chunk=5,
                               summary_draws=4), **KW)
    n = 200
    assert r["summary_count"] == 9
    assert r["w_mean"].shape == (2, n)
    # quantile subsample carries the chain axis: stride 3 over takes (5, 4)
    assert r["w_mcmc"].shape == (4, 2, n)
    assert np.isfinite(r["yhat_mcmc"]).all()
    # multi-chain runs surface convergence diagnostics on the theta draws
    nt = r["theta_mcmc"].shape[-1]
    assert r["theta_rhat"].shape == (nt,)
    assert r["theta_ess"].shape == (nt,)
    assert r["yhat_var"].shape == (2, n)
    assert np.isfinite(r["w_mean"]).all() and (r["w_var"] >= 0).all()
    assert not np.allclose(r["w_mean"][0], r["w_mean"][1])


def test_summary_draws_quantile_subsample():
    """settings=dict(collect="summary", summary_draws=m) keeps ~m strided
    draws alongside the exact moments: the retained w draws must bit-match
    the collect-all run's draws at the strided kept positions (same seed =>
    same trajectory; the slice is taken inside the chunk program)."""
    mcmc = dict(keep=24, burn=8, thin=1)
    ra = spamtree(*_data(), mcmc=mcmc, dtype=jnp.float64,
                  settings=dict(wire_dtype="none", chunk=10), **KW)
    rs = spamtree(*_data(), mcmc=mcmc, dtype=jnp.float64,
                  settings=dict(wire_dtype="none", collect="summary",
                                chunk=10, summary_draws=8), **KW)
    # chunk=10 -> balanced mc=8 (3 exact chunks); stride = ceil(24/8) = 3,
    # applied within each chunk (takes 8, 8, 8)
    idx = [ci * 8 + j for ci, take in enumerate([8, 8, 8])
           for j in range(0, take, 3)]
    assert rs["w_mcmc"].shape == (len(idx), ra["w_mcmc"].shape[1])
    assert np.array_equal(rs["w_mcmc"], ra["w_mcmc"][idx])
    assert np.isfinite(rs["yhat_mcmc"]).all()
    assert rs["yhat_mcmc"].shape == rs["w_mcmc"].shape
    # exact moments still come from ALL 24 draws, not the subsample
    assert rs["summary_count"] == 24
    np.testing.assert_allclose(rs["w_mean"], ra["w_mcmc"].mean(0),
                               rtol=1e-9, atol=1e-11)
    # posterior intervals from the subsample are usable and bracket the mean
    lo, hi = np.quantile(rs["w_mcmc"], [0.05, 0.95], axis=0)
    frac = np.mean((rs["w_mean"] >= lo) & (rs["w_mean"] <= hi))
    assert frac > 0.7, frac


def test_summary_draws_stride_exceeds_chunk():
    """When the requested global stride exceeds the chunk length, the
    subsample must still retain ~summary_draws draws (NOT one per chunk):
    the plan adds a chunk-level stride and the skipped chunks' subsample
    rows never cross the wire (regression: keep=10000/chunk=50/
    summary_draws=10 used to retain 200 draws)."""
    mcmc = dict(keep=24, burn=8, thin=1)
    ra = spamtree(*_data(), mcmc=mcmc, dtype=jnp.float64,
                  settings=dict(wire_dtype="none", chunk=5), **KW)
    rs = spamtree(*_data(), mcmc=mcmc, dtype=jnp.float64,
                  settings=dict(wire_dtype="none", collect="summary",
                                chunk=5, summary_draws=2), **KW)
    # global stride g = ceil(24/2) = 12 > mc = 5 -> local stride 5 (row 0 of
    # a used chunk), chunk stride round(12/5) = 2 -> chunks 0, 2, 4 ->
    # global kept indices 0, 10, 20
    assert rs["w_mcmc"].shape == (3, ra["w_mcmc"].shape[1])
    assert np.array_equal(rs["w_mcmc"], ra["w_mcmc"][[0, 10, 20]])
    # the exact moments still use ALL 24 draws
    assert rs["summary_count"] == 24
    np.testing.assert_allclose(rs["w_mean"], ra["w_mcmc"].mean(0),
                               rtol=1e-9, atol=1e-11)


def test_wire_f16_within_precision():
    """Default f32 runs ship w over the relay as float16; the reconstructed
    draws must match the full-precision wire within f16 rounding (2^-11
    relative), which is far below the posterior's own MC noise."""
    mcmc = dict(keep=10, burn=4, thin=1)
    rf = spamtree(*_data(), mcmc=mcmc,
                  settings=dict(wire_dtype="none"), **KW)
    rh = spamtree(*_data(), mcmc=mcmc, **KW)  # auto => f16 wire for f32
    scale = np.abs(rf["w_mcmc"]).max()
    np.testing.assert_allclose(rh["w_mcmc"], rf["w_mcmc"],
                               atol=2e-3 * scale, rtol=2e-3)
    # theta/beta never ride the compressed wire
    np.testing.assert_allclose(rh["theta_mcmc"], rf["theta_mcmc"], rtol=1e-6)


def test_burn_rounds_up_to_chunks():
    """Burn runs through the keep program in whole chunks (ONE compiled XLA
    program per run); the actual burn count is surfaced as burn_actual."""
    r = spamtree(*_data(n=200), mcmc=dict(keep=20, burn=10, thin=1),
                 precompile=True, **KW)
    assert r["burn_actual"] == 20  # rounded up to one 20-sample chunk
    assert r["w_mcmc"].shape[0] == 20
    # lazy path reports the CPU tuner; eager path the fused device program
    tb = r["setup_breakdown"]
    assert "cpu_tuner_s" in tb or "prepare_compile_s" in tb, tb
    # precompile attributes its span: trace/lower vs cache-load-or-compile
    # vs the async remote-delivery wait (bench setup_breakdown sub-dict)
    ph = tb["keep_compile_phases"]
    assert set(ph) == {"lower_s", "backend_compile_s", "cost_wait_s",
                       "exec_cache"}
    assert ph["exec_cache"] == "off"  # suite runs on XLA:CPU (gated)
    timed = {k: v for k, v in ph.items() if k != "exec_cache"}
    assert all(v >= 0.0 for v in timed.values())
    assert sum(timed.values()) <= tb["keep_compile_s"] + 0.05


def test_summary_resume_continues_moments(tmp_path):
    """An interrupted collect="summary" run must resume its saved partial
    posterior sums (checkpoint.save_state(moments=), load_moments): the
    summarized draws are not stored anywhere else, so restarting the
    accumulators at zero would silently drop the first segment.  The
    resumed run's final moments must equal the uninterrupted run's exactly
    (same summation order), for one chain and for two."""
    mcmc_full = dict(keep=12, burn=4, thin=1)
    sset = dict(wire_dtype="none", collect="summary", chunk=4)
    for n_chains in (1, 2):
        full = spamtree(*_data(), mcmc=mcmc_full, dtype=jnp.float64,
                        n_chains=n_chains, settings=sset, **KW)
        ck = str(tmp_path / f"ck{n_chains}.npz")
        half = spamtree(*_data(), mcmc=dict(keep=8, burn=4, thin=1),
                        dtype=jnp.float64, n_chains=n_chains,
                        settings=sset, checkpoint_path=ck, **KW)
        res = spamtree(*_data(), mcmc=mcmc_full, dtype=jnp.float64,
                       n_chains=n_chains, settings=sset, resume_from=ck,
                       **KW)
        assert res["resumed_kept_already"] == 8
        assert res["summary_count"] == 12  # 8 saved + 4 resumed
        np.testing.assert_array_equal(res["w_mean"], full["w_mean"])
        np.testing.assert_array_equal(res["w_var"], full["w_var"])
        np.testing.assert_array_equal(res["yhat_mean"], full["yhat_mean"])
        # the half run alone only saw its own 8 draws
        assert half["summary_count"] == 8


def test_summary_resume_requires_saved_moments(tmp_path):
    """Resuming a collect="summary" run from a checkpoint WITHOUT moment
    accumulators (written by a collect="all" run) must raise: the draws
    behind kept_already were never stored, so an exact continuation is
    impossible and a silent zero-restart would drop them from the summary."""
    import pytest

    ck = str(tmp_path / "ck.npz")
    spamtree(*_data(), mcmc=dict(keep=8, burn=4, thin=1),
             dtype=jnp.float64, settings=dict(wire_dtype="none", chunk=4),
             checkpoint_path=ck, **KW)  # collect="all": no moments saved
    with pytest.raises(ValueError, match="no moment accumulators"):
        spamtree(*_data(), mcmc=dict(keep=12, burn=4, thin=1),
                 dtype=jnp.float64,
                 settings=dict(wire_dtype="none", collect="summary",
                               chunk=4),
                 resume_from=ck, **KW)
    # mid-burn checkpoints hold no kept draws: summary resume stays legal
    ck2 = str(tmp_path / "ck2.npz")
    spamtree(*_data(), mcmc=dict(keep=0, burn=4, thin=1),
             dtype=jnp.float64, settings=dict(wire_dtype="none", chunk=4),
             checkpoint_path=ck2, **KW)
    res = spamtree(*_data(), mcmc=dict(keep=4, burn=4, thin=1),
                   dtype=jnp.float64,
                   settings=dict(wire_dtype="none", collect="summary",
                                 chunk=4),
                   resume_from=ck2, **KW)
    assert res["summary_count"] == 4


def test_read_sink_empty_and_bad_n(tmp_path):
    """read_sink on a zero-length sink (run interrupted before the first
    drain) returns 0 kept draws instead of np.memmap's opaque crash."""
    import pytest

    from spamtree_tpu.utils.native import read_sink

    p = str(tmp_path / "w_mcmc.f32")
    open(p, "wb").close()
    out = read_sink(p, n=100)
    assert out.shape == (0, 100) and out.dtype == np.float32
    out2 = read_sink(p, n=100, n_chains=3)
    assert out2.shape == (0, 3, 100)
    with pytest.raises(ValueError, match="positive"):
        read_sink(p, n=0)
