"""Geweke (2004) joint-distribution test of the Gibbs cycle.

With theta fixed, compares moments under two samplers of the joint
p(w, beta, tausq, y):

* marginal-conditional: iid forward draws  beta ~ N(0, Vi^-1),
  tausq^-1 ~ Gamma(a, rate b), w ~ treed prior, y | ... ~ N(Xb + w, tausq);
* successive-conditional: alternate one MCMC Gibbs cycle (w, tausq, beta |
  y) with re-simulation of y | (w, beta, tausq).

If the transition kernel is correct both samplers target the same joint, so
moment z-scores must be small.  This is the reference's missing test layer
(SURVEY.md section 4: "Geweke/joint-distribution tests for MCMC correctness").
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp

from spamtree_tpu.model.core import (
    ModelStatic,
    gibbs_beta,
    gibbs_tausq,
    gibbs_w,
    prior_sample_w,
    sweep,
)
from spamtree_tpu.model.mcmc import MCMCConfig, init_state, make_step
from spamtree_tpu.model.ram import ram_init
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def test_geweke_gibbs_cycle():
    rng = np.random.default_rng(0)
    n, p = 64, 2
    coords = rng.uniform(size=(n, 2))
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    mv = np.zeros(n, dtype=np.int64)
    X = rng.normal(size=(n, p))
    tree = make_tree(coords, np.ones(n, bool), mv, axis_cell_size=4, K=2,
                     rng=rng)
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 1)
    theta = np.array([2.0, 1.0, 1.0, 5.0])

    a_t, b_t = 2.01, 1.0
    Vi = jnp.eye(p)  # beta ~ N(0, I)
    Vim = jnp.zeros((p,))

    # y placeholder; ModelStatic needs y but we rebuild resid each iter via ms.y
    ms = ModelStatic(sched, coords, mv, np.zeros(n), X, tspec.spec,
                     dtype=jnp.float64)
    leveldata, _pd, logdet, ok = sweep(ms, jnp.asarray(theta), jnp.zeros((n + 1,)))
    assert bool(ok)

    Xj = jnp.asarray(X)

    def forward(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        beta = jax.random.normal(k1, (p,))  # Vi = I
        tinv = jax.random.gamma(k2, a_t) / b_t
        w = prior_sample_w(ms, leveldata, k3)[:n]
        y = Xj @ beta + w + jax.random.normal(k4, (n,)) / jnp.sqrt(tinv)
        return beta, tinv, w, y

    fwd = jax.jit(forward)

    def gibbs_cycle(carry, key):
        beta, tinv, w_full, y = carry
        k1, k2, k3, k4 = jax.random.split(key, 4)
        yl = jnp.append(y, 0.0)
        XB = jnp.append(Xj @ beta, 0.0)
        w_full = gibbs_w(ms, leveldata, w_full, tinv[None], XB, k1, y=yl)
        tinv = gibbs_tausq(ms, w_full, XB, k2, (a_t, b_t), y=yl)[0]
        beta2, XB2 = gibbs_beta(ms, w_full, tinv[None], k3, Vi, Vim, y=yl)
        beta = beta2[:, 0]
        y = Xj @ beta + w_full[:n] + jax.random.normal(k4, (n,)) / jnp.sqrt(tinv)
        return (beta, tinv, w_full, y), None

    cyc = jax.jit(lambda c, k: gibbs_cycle(c, k)[0])

    N = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    fw_beta = np.zeros((N, p))
    fw_tinv = np.zeros(N)
    fw_w2 = np.zeros(N)
    for i in range(N):
        b, ti, w, y = fwd(keys[i])
        fw_beta[i] = np.asarray(b)
        fw_tinv[i] = float(ti)
        fw_w2[i] = float(jnp.mean(w * w))

    b0, t0, w0, y0 = fwd(jax.random.PRNGKey(2))
    carry = (b0, t0, jnp.append(w0, 0.0), y0)
    keys2 = jax.random.split(jax.random.PRNGKey(3), N + 500)
    sc_beta = np.zeros((N, p))
    sc_tinv = np.zeros(N)
    sc_w2 = np.zeros(N)
    for i in range(N + 500):
        carry = cyc(carry, keys2[i])
        if i >= 500:
            sc_beta[i - 500] = np.asarray(carry[0])
            sc_tinv[i - 500] = float(carry[1])
            sc_w2[i - 500] = float(jnp.mean(carry[2][:n] ** 2))

    def zscore(a, b, lag=20):
        # batch-means SE for the (autocorrelated) successive-conditional chain
        nb = len(b) // lag
        bm = b[: nb * lag].reshape(nb, lag).mean(axis=1)
        se = np.sqrt(a.var() / len(a) + bm.var() / nb)
        return (a.mean() - b.mean()) / se

    zs = [
        zscore(fw_beta[:, 0], sc_beta[:, 0]),
        zscore(fw_beta[:, 1], sc_beta[:, 1]),
        zscore(fw_tinv, sc_tinv),
        zscore(fw_w2, sc_w2),
    ]
    assert np.max(np.abs(zs)) < 4.5, zs


def test_geweke_full_cycle_with_theta_mh():
    """Full-cycle Geweke INCLUDING the RAM-MH theta step.

    Extends the Gibbs-cycle test above to the complete transition kernel of
    ``make_step`` -- w-Gibbs, theta-MH (logit transforms + jacobian +
    chol-auto-reject + accept-swap of leveldata, the reference machinery at
    mh_adapt.h:78-135 / spamtree_fit.cpp:203-289), tausq-Gibbs, beta-Gibbs --
    with a proper (box-truncated gamma) prior on theta so the marginal of
    theta under the joint is known.

    * marginal-conditional: theta ~ truncated prior (host rejection
      sampling), w | theta ~ treed prior, beta ~ N(0, Vi^-1),
      tausq^-1 ~ Gamma(a, b), y | ... ~ N(Xb + w, tausq);
    * successive-conditional: the REAL ``make_step`` transition (adaptation
      off so the kernel is Markov) alternated with re-simulation of y.
      ``ms`` is passed as a traced pytree argument so the fresh y swaps in
      without recompiling.

    If theta-MH targets anything other than p(theta | w) prior(theta) --
    wrong jacobian, stale leveldata after an accept, prior dropped (the
    reference's own bug: spamtree_fit.cpp:239-246 computes and discards the
    prior logratio) -- the theta/w moments drift and the z-scores blow up.
    """
    rng = np.random.default_rng(7)
    n, p = 48, 2
    coords = rng.uniform(size=(n, 2))
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords = coords[order]
    mv = np.zeros(n, dtype=np.int64)
    X = rng.normal(size=(n, p))
    tree = make_tree(coords, np.ones(n, bool), mv, axis_cell_size=4, K=2,
                     rng=rng)
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, 1)
    nt = 4  # (ai1, ai2, phi, thetamv) for dd=2, q=1
    bounds = np.array([[0.25, 6.0]] * nt)

    # informative gamma(shape 8, rate 4) prior per dim: mean 2, sd ~0.71;
    # the box [0.25, 6] truncates only ~1e-6 of its mass, and the forward
    # sampler rejection-samples so the truncation is exact on both sides
    g_shape, g_rate = 8.0, 4.0
    a_t, b_t = 2.5, 1.0  # tausq_inv ~ Gamma(a_t, rate b_t)

    def draw_theta():
        while True:
            th = rng.gamma(g_shape, 1.0 / g_rate, size=nt)
            if np.all((th > bounds[:, 0]) & (th < bounds[:, 1])):
                return th

    ms = ModelStatic(sched, coords, mv, np.zeros(n), X, tspec.spec,
                     dtype=jnp.float64)
    Xj = jnp.asarray(X, dtype=jnp.float64)

    @jax.jit
    def fwd_given_theta(theta, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        leveldata, _pd, _logdet, ok = sweep(ms, theta, jnp.zeros((n + 1,)))
        w = prior_sample_w(ms, leveldata, k1)[:n]
        beta = jax.random.normal(k2, (p,))  # Vi = I
        tinv = jax.random.gamma(k3, a_t) / b_t
        y = Xj @ beta + w + jax.random.normal(k4, (n,)) / jnp.sqrt(tinv)
        return w, beta, tinv, y, ok

    cfg = MCMCConfig(
        adapting=False,           # fixed kernel: the chain must be Markov
        mcmcsd=0.09,              # logit-space proposal sd 0.3
        tausq_ab=(a_t, b_t),
        beta_Vi=1.0,              # Vi = I
        sample_predicts=False,
        theta_prior=[("gamma", g_shape, g_rate)] * nt,
    )

    @jax.jit
    def cyc(ms_arg, state, key):
        k1, k2 = jax.random.split(key)
        step = make_step(ms_arg, bounds, cfg)
        state = step(state, k1, False)
        tau_sd = jnp.sqrt(1.0 / state.tausq_inv)[ms_arg.mv[:n]]
        z = jax.random.normal(k2, (n,), dtype=jnp.float64)
        y = state.XB[:n] + state.w[:n] + tau_sd * z
        return jnp.append(y, 0.0), state

    # --- marginal-conditional (iid forward) draws
    N = 3000
    fkeys = jax.random.split(jax.random.PRNGKey(10), N)
    fw_th = np.zeros((N, nt))
    fw_b0 = np.zeros(N)
    fw_tinv = np.zeros(N)
    fw_w2 = np.zeros(N)
    for i in range(N):
        th = draw_theta()
        w, b, ti, _y, ok = fwd_given_theta(jnp.asarray(th), fkeys[i])
        assert bool(ok)
        fw_th[i] = th
        fw_b0[i] = float(b[0])
        fw_tinv[i] = float(ti)
        fw_w2[i] = float(jnp.mean(w * w))

    # --- successive-conditional chain through the real transition kernel
    th0 = draw_theta()
    w0, b0, t0, y0, ok0 = fwd_given_theta(jnp.asarray(th0),
                                          jax.random.PRNGKey(11))
    assert bool(ok0)
    ms_c = copy.copy(ms)
    ms_c.y = jnp.append(y0, 0.0)
    state = init_state(
        ms_c, bounds, th0, start_beta=np.asarray(b0),
        start_tausq=1.0 / float(t0), start_w=np.asarray(w0), cfg=cfg,
    )
    burn = 500
    skeys = jax.random.split(jax.random.PRNGKey(12), N + burn)
    sc_th = np.zeros((N, nt))
    sc_b0 = np.zeros(N)
    sc_tinv = np.zeros(N)
    sc_w2 = np.zeros(N)
    for i in range(N + burn):
        y_full, state = cyc(ms_c, state, skeys[i])
        ms_c = copy.copy(ms_c)
        ms_c.y = y_full
        if i >= burn:
            j = i - burn
            sc_th[j] = np.asarray(state.theta)
            sc_b0[j] = float(state.beta[0, 0])
            sc_tinv[j] = float(state.tausq_inv[0])
            sc_w2[j] = float(jnp.mean(state.w[:n] ** 2))

    # the MH kernel must actually move for the comparison to mean anything
    acc = float(state.ram.accept_count) / float(state.ram.propos_count)
    assert 0.05 < acc < 0.95, acc

    def zscore(a, b, lag=50):
        nb = len(b) // lag
        bm = b[: nb * lag].reshape(nb, lag).mean(axis=1)
        se = np.sqrt(a.var() / len(a) + bm.var() / nb)
        return (a.mean() - b.mean()) / se

    zs = {
        "theta0": zscore(fw_th[:, 0], sc_th[:, 0]),
        "theta1": zscore(fw_th[:, 1], sc_th[:, 1]),
        "theta2": zscore(fw_th[:, 2], sc_th[:, 2]),
        "theta3": zscore(fw_th[:, 3], sc_th[:, 3]),
        "theta0_sq": zscore(fw_th[:, 0] ** 2, sc_th[:, 0] ** 2),
        "beta0": zscore(fw_b0, sc_b0),
        "tinv": zscore(fw_tinv, sc_tinv),
        "w2": zscore(fw_w2, sc_w2),
        # interaction moment: couples the theta marginal to the w field --
        # catches stale-leveldata / swap bugs that leave both marginals intact
        "th0_x_w2": zscore(fw_th[:, 0] * fw_w2, sc_th[:, 0] * sc_w2),
    }
    worst = max(abs(v) for v in zs.values())
    assert worst < 4.5, zs


def test_geweke_full_cycle_multivariate_q2():
    """Full-cycle Geweke for the q=2 AG10 multivariate path: 8-dim theta
    (ai1[2], ai2[2], phi[2], thetamv, latent cross-distance D) through the
    RAM-MH accept-swap with misaligned margins -- the configuration the
    north-star benchmark actually runs, which the q=1 test above cannot
    reach (no latent Dmat, no per-margin ai/phi, no negative-signed ai1_2
    box through the logit transform).

    Priors: gamma(8, rate 4) per positive dimension, FLAT on ai1_2 over an
    asymmetric box [-2, 3] (flat-on-box is a proper uniform prior; the
    forward sampler draws it uniformly).  The forward sampler also
    rejection-samples theta on the sweep's Cholesky ok flag, which matches
    the transition kernel's chol-auto-reject exactly: both target
    prior(theta) 1{ok(theta)} (reference semantics: proposals whose
    covariance factorization fails are rejected, spamtree_fit.cpp:203-289).

    An 8-dim fixed-sd kernel mixes too slowly for honest batch-means SEs
    (measured ESS ~9 for the margin-1 field moment at 3000 cycles), so the
    proposal covariance is LEARNED in a discarded adaptive pre-phase and
    then frozen -- the recorded chain runs a fixed (Markov) kernel, as
    Geweke requires -- and the whole successive chain runs inside one
    lax.scan so 15k cycles are affordable.  Runs through the DEFAULT
    single-chain step, i.e. the accept-aware restructured kernel, so this
    also pins that restructuring distributionally on the multivariate path.
    """
    rng = np.random.default_rng(21)
    n, p, q = 64, 2, 2
    coords = rng.uniform(size=(n, 2))
    mv = rng.integers(0, q, size=n)  # misaligned margins
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    X = rng.normal(size=(n, p))
    tree = make_tree(coords, np.ones(n, bool), mv, axis_cell_size=4, K=2,
                     rng=rng)
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, q)
    nt = 8  # ai1[2], ai2[2], phi[2], thetamv, D
    assert len(tspec.start) == nt
    bounds = np.array([[0.25, 6.0]] * nt)
    bounds[1] = (-2.0, 3.0)   # ai1_2: sign of the cross-covariance
    g_shape, g_rate = 8.0, 4.0
    a_t, b_t = 2.5, 1.0

    ms = ModelStatic(sched, coords, mv, np.zeros(n), X, tspec.spec,
                     dtype=jnp.float64)
    Xj = jnp.asarray(X, dtype=jnp.float64)
    mvj = jnp.asarray(mv)
    m0 = mv == 0

    @jax.jit
    def theta_ok(theta):
        return sweep(ms, theta, jnp.zeros((n + 1,)))[3]

    def draw_theta():
        while True:
            th = rng.gamma(g_shape, 1.0 / g_rate, size=nt)
            th[1] = rng.uniform(-2.0, 3.0)
            if not np.all((th > bounds[:, 0]) & (th < bounds[:, 1])):
                continue
            if bool(theta_ok(jnp.asarray(th))):
                return th

    @jax.jit
    def fwd_given_theta(theta, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        leveldata, _pd, _logdet, ok = sweep(ms, theta, jnp.zeros((n + 1,)))
        w = prior_sample_w(ms, leveldata, k1)[:n]
        beta = jax.random.normal(k2, (p, q))  # Vi = I per margin
        tinv = jax.random.gamma(k3, a_t, shape=(q,)) / b_t
        sd = jnp.sqrt(1.0 / tinv)[mvj]
        y = jnp.sum((Xj @ beta) * ms.mv_onehot, axis=1) + w \
            + sd * jax.random.normal(k4, (n,))
        return w, beta, tinv, y, ok

    prior_spec = [("gamma", g_shape, g_rate)] * nt
    prior_spec[1] = None  # flat over the box = uniform
    cfg = MCMCConfig(
        adapting=False,
        mcmcsd=0.065,
        tausq_ab=(a_t, b_t),
        beta_Vi=1.0,
        sample_predicts=False,
        theta_prior=prior_spec,
    )

    def chain_scan(cfg_run):
        """One compiled program: T cycles of (transition, re-simulate y),
        recording the moment stats per cycle."""

        @jax.jit
        def run(state, y0, keys):
            def body(carry, key):
                st, y = carry
                msx = copy.copy(ms)
                msx.y = y
                k1, k2 = jax.random.split(key)
                step = make_step(msx, bounds, cfg_run)
                st = step(st, k1, False)
                tau_sd = jnp.sqrt(1.0 / st.tausq_inv)[mvj]
                z = jax.random.normal(k2, (n,), dtype=jnp.float64)
                yn = st.XB[:n] + st.w[:n] + tau_sd * z
                wn = st.w[:n]
                w2 = jnp.stack([jnp.mean(jnp.where(m0, wn, 0.0) ** 2) * n
                                / m0.sum(),
                                jnp.mean(jnp.where(~m0, wn, 0.0) ** 2) * n
                                / (~m0).sum()])
                stats = (st.theta, st.beta[0], st.tausq_inv, w2)
                return (st, jnp.append(yn, 0.0)), stats

            (st, y), stats = jax.lax.scan(body, (state, y0), keys)
            return st, y, stats

        return run

    # --- marginal-conditional (iid forward) draws
    N = 3000
    fkeys = jax.random.split(jax.random.PRNGKey(30), N)
    fw_th = np.zeros((N, nt))
    fw_b = np.zeros((N, 2))
    fw_tinv = np.zeros((N, 2))
    fw_w2 = np.zeros((N, 2))
    for i in range(N):
        th = draw_theta()
        w, b, ti, _y, ok = fwd_given_theta(jnp.asarray(th), fkeys[i])
        assert bool(ok)
        fw_th[i] = th
        fw_b[i] = np.asarray(b[0])
        fw_tinv[i] = np.asarray(ti)
        wn = np.asarray(w)
        fw_w2[i] = (np.mean(wn[m0] ** 2), np.mean(wn[~m0] ** 2))

    # --- successive-conditional chain through the real transition kernel
    th0 = draw_theta()
    w0, b0, t0, y0, ok0 = fwd_given_theta(jnp.asarray(th0),
                                          jax.random.PRNGKey(31))
    assert bool(ok0)
    state = init_state(
        ms, bounds, th0, start_beta=np.asarray(b0[:, 0]),
        start_tausq=1.0 / float(t0[0]), start_w=np.asarray(w0), cfg=cfg,
    )
    # adaptive pre-phase (discarded): learn the proposal covariance, then
    # freeze it so the recorded kernel is Markov
    pre = chain_scan(cfg._replace(adapting=True))
    akeys = jax.random.split(jax.random.PRNGKey(32), 2500)
    state, y_cur, _ = pre(state, jnp.append(y0, 0.0), akeys)
    S = state.ram.paramsd
    state = state._replace(ram=ram_init(S @ S.T))

    run = chain_scan(cfg)
    burn, T = 1000, 12000
    bkeys = jax.random.split(jax.random.PRNGKey(33), burn)
    state, y_cur, _ = run(state, y_cur, bkeys)
    rkeys = jax.random.split(jax.random.PRNGKey(34), T)
    state, y_cur, stats = run(state, y_cur, rkeys)
    sc_th = np.asarray(stats[0])
    sc_b = np.asarray(stats[1])
    sc_tinv = np.asarray(stats[2])
    sc_w2 = np.asarray(stats[3])

    acc = float(state.ram.accept_count) / float(state.ram.propos_count)
    assert 0.1 < acc < 0.6, acc

    def zscore(a, b, lag=300):
        nb = len(b) // lag
        bm = b[: nb * lag].reshape(nb, lag).mean(axis=1)
        se = np.sqrt(a.var() / len(a) + bm.var() / nb)
        return (a.mean() - b.mean()) / se

    zs = {}
    for d in range(nt):
        zs[f"theta{d}"] = zscore(fw_th[:, d], sc_th[:, d])
    zs["theta1_sq"] = zscore(fw_th[:, 1] ** 2, sc_th[:, 1] ** 2)
    zs["theta7_sq"] = zscore(fw_th[:, 7] ** 2, sc_th[:, 7] ** 2)
    for j in (0, 1):
        zs[f"beta_m{j}"] = zscore(fw_b[:, j], sc_b[:, j])
        zs[f"tinv_m{j}"] = zscore(fw_tinv[:, j], sc_tinv[:, j])
        zs[f"w2_m{j}"] = zscore(fw_w2[:, j], sc_w2[:, j])
    # couples the latent-D marginal to the field: catches a stale-factor
    # swap that leaves both marginals individually intact
    zs["th7_x_w2"] = zscore(fw_th[:, 7] * fw_w2[:, 0],
                            sc_th[:, 7] * sc_w2[:, 0])
    worst = max(abs(v) for v in zs.values())
    assert worst < 4.5, zs
