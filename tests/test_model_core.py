"""Model-core correctness: the batched padded sweeps must reproduce the exact
treed-DAG math.

* ``test_sweep_matches_bruteforce``: the likelihood sweep (propagated
  inverse-Cholesky factors over padded levels) equals a naive NumPy
  evaluation of sum_u log N(w_u; H_u w_par(u), R_u) computed directly from
  dense covariance solves per block.
* ``test_gibbs_w_targets_exact_posterior``: the leaf->root blocked Gibbs
  sampler with scatter-add messages has the correct stationary distribution
  N(Q^-1 b, Q^-1) with Q = (I-A)' D^-1 (I-A) + tau^-2 I.
"""

import numpy as np
import jax
import jax.numpy as jnp

from spamtree_tpu.model.core import ModelStatic, gibbs_w, quad_loglik, sweep
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.ops.covariance import pairwise_cov, unpack_theta
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _setup(n=300, seed=0, q=1, miss=0.0, tree_depth=np.inf, cell=9,
           limited_tree=False):
    rng = np.random.default_rng(seed)
    if q == 1:
        coords = rng.uniform(size=(n, 2))
        mv = np.zeros(n, dtype=np.int64)
    else:
        base = rng.uniform(size=(n // q, 2))
        coords = np.repeat(base, q, axis=0)
        mv = np.tile(np.arange(q), n // q)
        n = len(coords)
    na = rng.uniform(size=n) > miss
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv, na = coords[order], mv[order], na[order]
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = np.ones((n, 1))
    tree = make_tree(coords, na, mv, axis_cell_size=int(np.sqrt(cell)), K=2,
                     tree_depth=tree_depth, rng=rng, limited_tree=limited_tree)
    sched = build_schedule(tree, limited_tree=limited_tree)
    tspec = make_theta_spec(2, q)
    ms = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=jnp.float64)
    return ms, tree, sched, tspec, coords, mv, y, na


def _dense_cov(ms, theta, coords, mv):
    params = unpack_theta(jnp.asarray(theta, dtype=jnp.float64), ms.spec)
    return np.asarray(
        pairwise_cov(jnp.asarray(coords), jnp.asarray(mv), jnp.asarray(coords),
                     jnp.asarray(mv), params, ms.spec)
    )


def _brute_blocks(ms, tree, sched, C):
    """Per observed block: (rows, par_rows, H, R or diag r, is_ref)."""
    out = []
    nb = sched.n_blocks
    for plan in sched.levels:
        # merged thin plans carry (B, M) member-id sets padded with n_blocks
        for u in np.asarray(plan.block_ids).ravel():
            if u >= nb:
                continue
            rows = tree.block_rows[u]
            if len(tree.parents[u]):
                par = np.concatenate([tree.block_rows[p] for p in tree.parents[u]])
            else:
                par = np.zeros(0, dtype=np.int64)
            if par.size:
                Kpp = C[np.ix_(par, par)]
                Kpu = C[np.ix_(par, rows)]
                H = np.linalg.solve(Kpp, Kpu).T
                R = C[np.ix_(rows, rows)] - H @ Kpu
            else:
                H = np.zeros((len(rows), 0))
                R = C[np.ix_(rows, rows)]
            out.append((rows, par, H, R, plan.is_ref))
    return out


def test_sweep_matches_bruteforce():
    ms, tree, sched, tspec, coords, mv, y, na = _setup(tree_depth=2)
    assert len(sched.levels) >= 3  # root, ref, thin leftover
    assert not sched.levels[-1].is_ref
    rng = np.random.default_rng(1)
    theta = tspec.start.copy()
    w = rng.normal(size=ms.n)
    wj = jnp.asarray(np.append(w, 0.0))

    leveldata, _pd, logdet, ok = jax.jit(lambda t, w_: sweep(ms, t, w_))(
        jnp.asarray(theta), wj
    )
    assert bool(ok)
    got = float(logdet + quad_loglik(ms, leveldata, wj))

    C = _dense_cov(ms, theta, coords, mv)
    want = 0.0
    for rows, par, H, R, is_ref in _brute_blocks(ms, tree, sched, C):
        wx = w[rows] - H @ w[par]
        if is_ref:
            sign, ld = np.linalg.slogdet(R)
            assert sign > 0
            want += -0.5 * ld - 0.5 * wx @ np.linalg.solve(R, wx)
        else:
            r = np.diag(R)
            want += -0.5 * np.sum(np.log(r)) - 0.5 * np.sum(wx * wx / r)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_sweep_matches_bruteforce_bivariate():
    ms, tree, sched, tspec, coords, mv, y, na = _setup(n=240, q=2, cell=16)
    rng = np.random.default_rng(2)
    theta = tspec.start.copy()
    theta[-1] = 0.8  # latent cross-distance
    w = rng.normal(size=ms.n)
    wj = jnp.asarray(np.append(w, 0.0))
    leveldata, _pd, logdet, ok = sweep(ms, jnp.asarray(theta), wj)
    assert bool(ok)
    got = float(logdet + quad_loglik(ms, leveldata, wj))
    C = _dense_cov(ms, theta, coords, mv)
    want = 0.0
    for rows, par, H, R, is_ref in _brute_blocks(ms, tree, sched, C):
        wx = w[rows] - H @ w[par]
        if is_ref:
            sign, ld = np.linalg.slogdet(R)
            want += -0.5 * ld - 0.5 * wx @ np.linalg.solve(R, wx)
        else:
            r = np.diag(R)
            want += -0.5 * np.sum(np.log(r)) - 0.5 * np.sum(wx * wx / r)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_sweep_matches_bruteforce_limited_tree():
    ms, tree, sched, tspec, coords, mv, y, na = _setup(limited_tree=True)
    rng = np.random.default_rng(4)
    theta = tspec.start.copy()
    w = rng.normal(size=ms.n)
    wj = jnp.asarray(np.append(w, 0.0))
    leveldata, _pd, logdet, ok = sweep(ms, jnp.asarray(theta), wj)
    assert bool(ok)
    got = float(logdet + quad_loglik(ms, leveldata, wj))
    C = _dense_cov(ms, theta, coords, mv)
    want = 0.0
    for rows, par, H, R, is_ref in _brute_blocks(ms, tree, sched, C):
        wx = w[rows] - H @ w[par]
        if is_ref:
            sign, ld = np.linalg.slogdet(R)
            want += -0.5 * ld - 0.5 * wx @ np.linalg.solve(R, wx)
        else:
            r = np.diag(R)
            want += -0.5 * np.sum(np.log(r)) - 0.5 * np.sum(wx * wx / r)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_chunked_levels_match_unchunked():
    """B-axis chunking (sequential slabs) must be numerically identical."""
    ms, tree, sched, tspec, coords, mv, y, na = _setup(n=280, tree_depth=2)
    ms_c = ModelStatic(sched, coords, mv, np.where(na, y, np.nan),
                       np.ones((ms.n, 1)), tspec.spec, dtype=jnp.float64,
                       chunk_bytes=1e4)  # force chunking everywhere
    assert max(ms_c.level_chunks) > 1
    rng = np.random.default_rng(9)
    theta = jnp.asarray(tspec.start)
    w = jnp.asarray(np.append(rng.normal(size=ms.n), 0.0))
    ld1, _p1, logdet1, ok1 = sweep(ms, theta, w)
    ld2, _p2, logdet2, ok2 = sweep(ms_c, theta, w)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(float(logdet1), float(logdet2), rtol=1e-12)
    for a, b in zip(ld1, ld2):
        bH = np.asarray(b.H)[: a.H.shape[0]]  # chunk padding adds dummy blocks
        np.testing.assert_allclose(np.asarray(a.H), bH, atol=1e-12)
    key = jax.random.PRNGKey(3)
    ti = jnp.asarray([4.0])
    XB = jnp.zeros((ms.n + 1,))
    w1 = gibbs_w(ms, ld1, w, ti, XB, key)
    w2 = gibbs_w(ms_c, ld2, w, ti, XB, key)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-10)


def test_predict_recompute_matches_carry():
    """Large-n prediction path (operators rebuilt per kept iteration) must
    equal the carried-operator path exactly."""
    from spamtree_tpu.model.core import predict, predict_recompute

    ms, tree, sched, tspec, coords, mv, y, na = _setup(n=260, miss=0.15)
    assert sched.pred is not None
    theta = jnp.asarray(tspec.start)
    rngk = jax.random.PRNGKey(7)
    w = jnp.asarray(np.append(np.random.default_rng(0).normal(size=ms.n), 0.0))
    leveldata, pd, logdet, ok = sweep(ms, theta, w)
    assert bool(ok) and pd is not None
    w1 = predict(ms, pd, w, rngk)
    w2 = predict_recompute(ms, theta, w, rngk)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-9)


def test_gibbs_w_targets_exact_posterior():
    ms, tree, sched, tspec, coords, mv, y, na = _setup(n=150, tree_depth=2, cell=9)
    theta = jnp.asarray(tspec.start)
    n = ms.n
    tausq_inv = jnp.asarray([4.0])
    XB = jnp.zeros((n + 1,))
    wj = jnp.zeros((n + 1,))
    leveldata, _pd, logdet, ok = sweep(ms, theta, wj)
    assert bool(ok)

    # exact posterior from the DAG-factorized prior precision
    C = _dense_cov(ms, np.asarray(theta), coords, mv)
    A = np.zeros((n, n))
    Dinv = np.zeros((n, n))
    for rows, par, H, R, is_ref in _brute_blocks(ms, tree, sched, C):
        if par.size:
            A[np.ix_(rows, par)] = H
        Ri = np.linalg.inv(R) if is_ref else np.diag(1.0 / np.diag(R))
        Dinv[np.ix_(rows, rows)] = Ri
    IA = np.eye(n) - A
    Q = IA.T @ Dinv @ IA + 4.0 * np.eye(n)
    b = 4.0 * np.nan_to_num(np.asarray(y))
    mean = np.linalg.solve(Q, b)

    step = jax.jit(lambda w_, k: gibbs_w(ms, leveldata, w_, tausq_inv, XB, k))
    key = jax.random.PRNGKey(0)
    w = wj
    burn, keep = 200, 2500
    acc = np.zeros(n)
    for i in range(burn + keep):
        key, sub = jax.random.split(key)
        w = step(w, sub)
        if i >= burn:
            acc += np.asarray(w[:n])
    wbar = acc / keep
    sd = np.sqrt(np.diag(np.linalg.inv(Q)))
    zerr = (wbar - mean) / sd
    # MC error: per-sweep samples are autocorrelated; allow generous slack
    assert np.abs(zerr).mean() < 0.25, np.abs(zerr).mean()
    assert np.abs(wbar - mean).max() < 0.5


def test_gibbs_w_routed_gram_bitwise():
    """route_gram (the accept-time precompute of the per-level Sigi message
    sums) must be BIT-identical to routing the Gram blocks in place every
    iteration -- matching accumulation order -- across the full tree, a
    misaligned q=2 tree, a limited tree, and forced B-axis chunking."""
    from spamtree_tpu.model.core import gram_full

    cases = [
        dict(n=320, cell=9),
        dict(n=340, cell=9, q=2, miss=0.15),
        dict(n=320, cell=9, limited_tree=True),
    ]
    for kw in cases:
        ms, tree, sched, tspec, coords, mv, y, na = _setup(**kw)
        theta = jnp.asarray(tspec.start)
        rng = np.random.default_rng(11)
        w = jnp.asarray(np.append(rng.normal(size=ms.n), 0.0))
        leveldata, _pd, _lg, ok = sweep(ms, theta, w)
        assert bool(ok)
        gram, routed = jax.jit(gram_full)(ms, leveldata)
        # at least one level must actually receive a precomputed sum
        assert any(not isinstance(r, tuple) for r in routed)
        key = jax.random.PRNGKey(5)
        ti = jnp.full((ms.q,), 4.0)
        XB = jnp.zeros((ms.n + 1,))
        w_in = jax.jit(
            lambda: gibbs_w(ms, leveldata, w, ti, XB, key, gram=gram)
        )()
        w_rt = jax.jit(
            lambda: gibbs_w(ms, leveldata, w, ti, XB, key, gram=gram,
                            routed=routed)
        )()
        assert np.array_equal(np.asarray(w_in), np.asarray(w_rt)), kw

    # forced chunking: the chunked scan path consumes chunked routed slabs
    ms, tree, sched, tspec, coords, mv, y, na = _setup(n=280, tree_depth=2)
    ms_c = ModelStatic(sched, coords, mv, np.where(na, y, np.nan),
                       np.ones((ms.n, 1)), tspec.spec, dtype=jnp.float64,
                       chunk_bytes=1e4)
    assert max(ms_c.level_chunks) > 1
    theta = jnp.asarray(tspec.start)
    w = jnp.asarray(np.append(np.random.default_rng(3).normal(size=ms_c.n), 0.0))
    leveldata, _pd, _lg, ok = sweep(ms_c, theta, w)
    assert bool(ok)
    gram, routed = jax.jit(gram_full)(ms_c, leveldata)
    key = jax.random.PRNGKey(2)
    ti = jnp.asarray([4.0])
    XB = jnp.zeros((ms_c.n + 1,))
    w_in = jax.jit(
        lambda: gibbs_w(ms_c, leveldata, w, ti, XB, key, gram=gram)
    )()
    w_rt = jax.jit(
        lambda: gibbs_w(ms_c, leveldata, w, ti, XB, key, gram=gram,
                        routed=routed)
    )()
    assert np.array_equal(np.asarray(w_in), np.asarray(w_rt))


def test_fused_beta_tausq_matches_separate():
    """gibbs_beta_tausq (one GEMM for both O(n) reductions + unrolled
    solve chain) must reproduce the separate gibbs_tausq -> gibbs_beta
    sequence with the same keys to f64 reassociation tolerance."""
    from spamtree_tpu.model.core import (
        gibbs_beta, gibbs_beta_tausq, gibbs_tausq,
    )

    rng = np.random.default_rng(4)
    ms, tree, sched, tspec, coords, mv, y, na = _setup(
        n=400, q=2, miss=0.1, seed=4
    )
    p = 3
    X = rng.normal(size=(ms.n, p))
    ms2 = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=ms2.n) * 0.5, 0.0))
    beta0 = jnp.asarray(rng.normal(size=(p, ms2.q)))
    XBq = ms2.X @ beta0
    XB = jnp.append(jnp.sum(XBq * ms2.mv_onehot, axis=1), 0.0)
    Vi = jnp.asarray(0.01 * np.eye(p))
    Vim = jnp.zeros((p,))
    kq, kb = jax.random.split(jax.random.PRNGKey(3))
    ab = (2.01, 1.0)

    ti_sep = gibbs_tausq(ms2, w, XB, kq, ab)
    beta_sep, XB_sep = gibbs_beta(ms2, w, ti_sep, kb, Vi, Vim)
    ti_f, beta_f, XB_f = gibbs_beta_tausq(ms2, w, XB, kq, kb, ab, Vi, Vim)
    np.testing.assert_allclose(np.asarray(ti_f), np.asarray(ti_sep),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(beta_f), np.asarray(beta_sep),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(XB_f), np.asarray(XB_sep),
                               rtol=1e-8, atol=1e-10)


def test_fused_beta_tausq_large_p_path():
    """p > 8 falls back to the batched linalg solve chain."""
    from spamtree_tpu.model.core import gibbs_beta, gibbs_beta_tausq, gibbs_tausq

    rng = np.random.default_rng(9)
    ms, tree, sched, tspec, coords, mv, y, na = _setup(n=300, q=1, seed=9)
    p = 10
    X = rng.normal(size=(ms.n, p))
    ms2 = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=ms2.n) * 0.5, 0.0))
    XB = jnp.zeros((ms2.n + 1,))
    Vi = jnp.asarray(0.01 * np.eye(p))
    Vim = jnp.zeros((p,))
    kq, kb = jax.random.split(jax.random.PRNGKey(8))
    ab = (2.01, 1.0)
    ti_sep = gibbs_tausq(ms2, w, XB, kq, ab)
    beta_sep, XB_sep = gibbs_beta(ms2, w, ti_sep, kb, Vi, Vim)
    ti_f, beta_f, XB_f = gibbs_beta_tausq(ms2, w, XB, kq, kb, ab, Vi, Vim)
    np.testing.assert_allclose(np.asarray(ti_f), np.asarray(ti_sep),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(beta_f), np.asarray(beta_sep),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(XB_f), np.asarray(XB_sep),
                               rtol=1e-8, atol=1e-10)


def test_coords_cache_sweep_parity():
    """sweep(coords_cache=level_coords(ms)) must reproduce the gather-based
    sweep bit-for-bit (the cache is a pure hoist of static gathers)."""
    from spamtree_tpu.model.core import level_coords

    ms, tree, sched, tspec, coords, mv, y, na = _setup(n=400, q=2, miss=0.1,
                                                       seed=6)
    rng = np.random.default_rng(2)
    theta = jnp.asarray(tspec.start, jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=ms.n) * 0.4, 0.0))
    ld0, pd0, lg0, ok0 = jax.jit(lambda t: sweep(ms, t, w))(theta)
    cc = level_coords(ms)
    ldc, pdc, lgc, okc = jax.jit(
        lambda t: sweep(ms, t, w, coords_cache=cc)
    )(theta)
    assert bool(ok0) and bool(okc)
    np.testing.assert_array_equal(np.asarray(lg0), np.asarray(lgc))
    for a, b in zip(jax.tree.leaves(ld0), jax.tree.leaves(ldc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    prop = theta * 1.05 + 0.01
    r0 = jax.jit(lambda t: sweep(ms, t, w, quad_prev=ld0,
                                 decision_only=True))(prop)
    rc = jax.jit(lambda t: sweep(ms, t, w, quad_prev=ld0,
                                 decision_only=True, coords_cache=cc))(prop)
    for a, b in zip(r0, rc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
