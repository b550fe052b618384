"""Parity gates for the fused thin-level Pallas kernels (ops/pallas_level.py).

The kernels replace, on the TPU hot path, the thin-level bodies of the
decision sweep and w-Gibbs (reference semantics: get_loglik_comps_w_std /
gibbs_sample_w_std, src/spamtree_model.cpp:926-961, 1011-1226).  On the CPU
test mesh they run in Pallas interpreter mode, forced on via the
SPAMTREE_LEVEL_KERNELS env gate, and must reproduce the plain-XLA level
bodies to float64 tightness — including the scalar-prefetch parent-factor
addressing on an UNALIGNED level (lp_pos gather) and on dummy padded blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spamtree_tpu.model.core import ModelStatic, gibbs_w, msg_gram, sweep
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _model(limited=False, n_loc=220, seed=3):
    rng = np.random.default_rng(seed)
    q = 2
    base = rng.uniform(size=(n_loc, 2))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), n_loc)
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
    thin = [t for t in range(len(ms.levels))
            if not ms.level_is_ref[t] and ms.levels[t].prows.shape[1] > 0]
    assert thin, "test model must have a thin level with parents"
    return ms, tspec, rng


@pytest.mark.parametrize("limited", [False, True], ids=["full", "limited"])
def test_thin_decision_kernel_parity(monkeypatch, limited):
    ms, tspec, rng = _model(limited)
    theta = jnp.asarray(tspec.start, jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=ms.n) * 0.4, 0.0))
    ld, _, _, ok0 = jax.jit(lambda t: sweep(ms, t, w))(theta)
    assert bool(ok0)
    prop = theta * 1.12 + 0.01

    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "1")
    r_on = jax.jit(lambda t: sweep(ms, t, w, quad_prev=ld,
                                   decision_only=True))(prop)
    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "0")
    r_off = jax.jit(lambda t: sweep(ms, t, w, quad_prev=ld,
                                    decision_only=True))(prop)
    assert bool(r_on[1]) == bool(r_off[1])
    for a, b in zip((r_on[0], r_on[2], r_on[3]), (r_off[0], r_off[2], r_off[3])):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("limited", [False, True], ids=["full", "limited"])
def test_thin_gibbs_kernel_parity(monkeypatch, limited):
    ms, tspec, rng = _model(limited)
    theta = jnp.asarray(tspec.start, jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=ms.n) * 0.4, 0.0))
    ld, _, _, ok0 = jax.jit(lambda t: sweep(ms, t, w))(theta)
    assert bool(ok0)
    gram = msg_gram(ms, ld)
    XB = jnp.zeros((ms.n + 1,), dtype=jnp.float64)
    ti = jnp.asarray([4.0, 7.0], dtype=jnp.float64)
    key = jax.random.PRNGKey(7)

    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "1")
    w_on = jax.jit(lambda: gibbs_w(ms, ld, w, ti, XB, key, gram=gram))()
    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "0")
    w_off = jax.jit(lambda: gibbs_w(ms, ld, w, ti, XB, key, gram=gram))()
    np.testing.assert_allclose(np.asarray(w_on), np.asarray(w_off),
                               rtol=1e-11, atol=1e-12)


def test_unaligned_scalar_prefetch_gather():
    """Direct kernel check: lp_pos addressing with Bp != B and shuffled,
    repeated parent positions must equal the explicit-gather jnp math."""
    from spamtree_tpu.ops.pallas_level import thin_decision_level

    rng = np.random.default_rng(0)
    B, Bp, P, S = 6, 4, 9, 5
    f = jnp.float64
    Kxc = jnp.asarray(rng.normal(size=(B, P, S)), f)
    joint = jnp.asarray(rng.normal(size=(Bp, P, P)), f)
    lp_pos = jnp.asarray([2, 0, 0, 3, 1, 2], jnp.int32)
    wpar = jnp.asarray(rng.normal(size=(B, P)), f)
    w_r = jnp.asarray(rng.normal(size=(B, S)), f)
    prevH = jnp.asarray(rng.normal(size=(B, S, P)), f)
    prevprec = jnp.asarray(rng.uniform(1.0, 2.0, size=(B, S)), f)
    kdiag = jnp.asarray(rng.uniform(5.0, 9.0, size=(B, S)), f)
    rmask = np.ones((B, S))
    rmask[1, 3:] = 0.0  # partially masked block
    rmask_f = jnp.asarray(rmask, f)

    ld_k, ok_k, qn_k, qc_k = thin_decision_level(
        Kxc, joint, lp_pos, wpar, w_r, prevH, prevprec, kdiag, rmask_f,
        interpret=True)

    LAi = joint[lp_pos]
    M = LAi @ Kxc
    hk = jnp.sum(M * M, axis=1)
    r = jnp.where(rmask_f > 0.5, kdiag - hk, 1.0)
    okl = jnp.isfinite(r) & (r > 0)
    r = jnp.where(okl, r, 1.0)
    ld = -0.5 * jnp.sum(jnp.where(rmask_f > 0.5, jnp.log(r), 0.0))
    hw = jnp.einsum("bps,bp->bs", M, jnp.einsum("bpq,bq->bp", LAi, wpar))
    qn = -0.5 * jnp.sum((w_r - hw) ** 2 / r)
    wxc = w_r - jnp.einsum("bsp,bp->bs", prevH, wpar)
    qc = -0.5 * jnp.sum(prevprec * wxc * wxc)
    assert bool(ok_k) == bool(jnp.all(okl))
    np.testing.assert_allclose(float(ld_k), float(ld), rtol=1e-12)
    np.testing.assert_allclose(float(qn_k), float(qn), rtol=1e-12)
    np.testing.assert_allclose(float(qc_k), float(qc), rtol=1e-12)

    # aligned G-batched path (identity lp_pos, Bp == B): same math, the
    # joint batch streams with several blocks per grid step
    jointB = jnp.asarray(rng.normal(size=(B, P, P)), f)
    ident = jnp.arange(B, dtype=jnp.int32)
    ld_a, ok_a, qn_a, qc_a = thin_decision_level(
        Kxc, jointB, ident, wpar, w_r, prevH, prevprec, kdiag, rmask_f,
        aligned=True, interpret=True)
    LAiB = jointB
    MB = LAiB @ Kxc
    hkB = jnp.sum(MB * MB, axis=1)
    rB = jnp.where(rmask_f > 0.5, kdiag - hkB, 1.0)
    rB = jnp.where(jnp.isfinite(rB) & (rB > 0), rB, 1.0)
    ldB = -0.5 * jnp.sum(jnp.where(rmask_f > 0.5, jnp.log(rB), 0.0))
    hwB = jnp.einsum("bps,bp->bs", MB, jnp.einsum("bpq,bq->bp", LAiB, wpar))
    qnB = -0.5 * jnp.sum((w_r - hwB) ** 2 / rB)
    np.testing.assert_allclose(float(ld_a), float(ldB), rtol=1e-12)
    np.testing.assert_allclose(float(qn_a), float(qnB), rtol=1e-12)
    np.testing.assert_allclose(float(qc_a), float(qc), rtol=1e-12)


def test_step_level_parity_through_mcmc(monkeypatch):
    """Full accept-aware MCMC steps with kernels forced on vs off must give
    the same chain (tolerance-level: summation order differs)."""
    from spamtree_tpu.model.mcmc import MCMCConfig, init_state, make_step

    ms, tspec, rng = _model(n_loc=120, seed=5)
    cfg = MCMCConfig()

    def run():
        st = init_state(ms, tspec.bounds, tspec.start, cfg=cfg, seed=0)
        step = make_step(ms, tspec.bounds, cfg)
        ks = jax.random.split(jax.random.PRNGKey(3), 5)
        for k in ks:
            st = step(st, k, False)
        return np.asarray(st.theta), np.asarray(st.w), float(st.logdetCi)

    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "1")
    th_on, w_on, ld_on = run()
    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "0")
    th_off, w_off, ld_off = run()
    np.testing.assert_allclose(th_on, th_off, rtol=1e-9)
    np.testing.assert_allclose(w_on, w_off, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(ld_on, ld_off, rtol=1e-10)


def test_thin_decision_vpu_variant_parity():
    """The aligned-layout VPU variant (no augmented column, u = LAi wpar as
    a lane reduce; pallas_level._thin_decision_kernel_vpu) must match the
    jnp math exactly.  P = 128 triggers the variant selection."""
    from spamtree_tpu.ops.pallas_level import thin_decision_level

    rng = np.random.default_rng(7)
    B, P, S = 8, 128, 16
    f = jnp.float64
    Kxc = jnp.asarray(rng.normal(size=(B, P, S)), f)
    LAi = jnp.asarray(
        np.tril(rng.normal(size=(B, P, P))) + 3.0 * np.eye(P), f)
    wpar = jnp.asarray(rng.normal(size=(B, P)), f)
    w_r = jnp.asarray(rng.normal(size=(B, S)), f)
    prevH = jnp.asarray(rng.normal(size=(B, S, P)), f)
    prevprec = jnp.asarray(rng.uniform(1.0, 2.0, size=(B, S)), f)
    rmask = np.ones((B, S), dtype=bool)
    rmask[0, S - 3:] = False  # masked tail rows on one block
    M = jnp.einsum("bpq,bqs->bps", LAi, Kxc)
    hk = jnp.sum(M * M, axis=1)
    kdiag = jnp.asarray(hk + rng.uniform(0.5, 1.5, size=(B, S)), f)
    r = jnp.where(rmask, kdiag - hk, 1.0)
    hw = jnp.einsum("bps,bp->bs", M, jnp.einsum("bpq,bq->bp", LAi, wpar))
    wx = w_r - hw
    want_logdet = -0.5 * float(jnp.sum(jnp.where(rmask, jnp.log(r), 0.0)))
    want_qn = -0.5 * float(jnp.sum(wx * wx / r))
    wxc = w_r - jnp.einsum("bsp,bp->bs", prevH, wpar)
    want_qc = -0.5 * float(jnp.sum(prevprec * wxc * wxc))

    ld, ok, qn, qc = thin_decision_level(
        Kxc, LAi, jnp.arange(B, dtype=jnp.int32), wpar, w_r, prevH,
        prevprec, kdiag, jnp.asarray(rmask, f), aligned=True,
        interpret=True,
    )
    assert bool(ok)
    np.testing.assert_allclose(float(ld), want_logdet, rtol=1e-12)
    np.testing.assert_allclose(float(qn), want_qn, rtol=1e-12)
    np.testing.assert_allclose(float(qc), want_qc, rtol=1e-12)
