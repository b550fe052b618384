"""Proposal-covariance pre-tuning for the theta RAM-Metropolis step.

The reference starts every chain with an isotropic logit-scale proposal
(mcmc_startfrom / mcmcsd, reference: src/spamtree_fit.cpp:151) and relies on
the RAM adapter to learn the posterior metric.  Rank-1 RAM needs O(d^2)
accepted moves to learn per-dimension scales, which is why the round-1
15-dim (q=3) and n=1e6 chains sat at 2-4% acceptance for the whole run.

The tuners here instead estimate the conditional log-posterior curvature
diag(-d^2 ll / dz_i^2) at the starting theta (z = logit-transformed theta,
the proposal space) by central finite differences, after settling the latent
field with a few w-Gibbs sweeps, and return the classic optimal-scale
diagonal covariance (2.38^2/d) * H_ii^-1 (Roberts/Rosenthal).  RAM then
starts from approximately the right per-dimension metric and only has to
learn correlations.  Two paths: ``prepare_chain`` fuses the FD batch into
the chain's initial-sweep program (eager init), ``subsample_curvature_sd``
runs on a subsampled model on the LOCAL CPU backend (lazy init -- zero
remote compile); both feed ``curvature_sd_from_lls``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from spamtree_tpu.model.core import (
    ModelStatic,
    gibbs_w,
    gram_full,
    sweep,
)
from spamtree_tpu.model.transforms import transf_back, transf_fwd


def curvature_sd_from_lls(lls, nt, fd_step=0.15, default_var=1e-4,
                          max_var=0.25, curv_scale=1.0):
    """Host-side half of the curvature tuner: turn the (2*nt+1,) FD
    log-likelihood values into the diagonal proposal covariance
    (2.38^2/d) * H_ii^-1 (Roberts/Rosenthal optimal scale).  Dimensions
    where the curvature estimate is non-positive or non-finite (flat or
    noisy directions) fall back to ``default_var``.  ``curv_scale``
    extrapolates a subsampled estimate to the full data size (the
    conditional log-likelihood Hessian grows ~linearly in n)."""
    lls = np.asarray(lls, dtype=np.float64)
    f0, fp, fm = lls[0], lls[1 : 1 + nt], lls[1 + nt :]
    h = fd_step
    curv = -(fp - 2.0 * f0 + fm) / (h * h) * curv_scale  # -d^2 ll / dz_i^2
    scale = 2.38**2 / nt
    var = np.full(nt, default_var)
    good = np.isfinite(curv) & (curv > 0)
    var[good] = np.clip(scale / curv[good], 1e-10, max_var)
    return np.diag(var)


def prepare_chain(
    ms: ModelStatic,
    bounds: np.ndarray,
    theta0: np.ndarray,
    do_curvature: bool = True,
    n_warm_gibbs: int = 5,
    fd_step: float = 0.15,
    start_tausq: float = 0.1,
    seed: int = 0,
    timings: dict | None = None,
):
    """ONE compiled program for everything the chain needs before iteration 0.

    Fuses what used to be three separately-compiled XLA programs -- the
    curvature tuner's w-warm sweep, its finite-difference log-likelihood
    batch, and ``init_state``'s initial likelihood sweep -- into a single
    jitted function.  On this machine each extra program costs minutes of
    remote compilation, so collapsing the count is the main lever on
    time-to-first-sample (the reference's whole pre-MCMC phase is seconds of
    R; spamtree_fit.R:204-324).

    Returns ``(precomputed, lls)`` where ``precomputed = (leveldata,
    pred_data, logdet, ok)`` is the initial sweep state for ``init_state``
    and ``lls`` is the (2*nt+1,) FD log-likelihood vector for
    ``curvature_sd_from_lls`` (None when ``do_curvature`` is False).
    ``timings`` (optional dict) receives ``prepare_compile_s`` /
    ``prepare_run_s``.
    """
    ms.materialize_device()  # _prep below takes ms as a jit argument
    nt = len(theta0)
    dt = ms.dtype
    bnds = jnp.asarray(bounds, dtype=dt)
    theta0j = jnp.asarray(theta0, dtype=dt)
    z0 = transf_fwd(theta0j, bnds)
    h = fd_step
    eye = jnp.eye(nt, dtype=dt)
    zs = jnp.concatenate([z0[None], z0 + h * eye, z0 - h * eye])

    def _prep(m, theta, zs, key):
        w0 = jnp.zeros((m.n + 1,), dtype=dt)
        ld, pd, logdet, ok = sweep(m, theta, w0, build_pred=True)
        gram = gram_full(m, ld)
        if not do_curvature:
            return ld, pd, logdet, ok, gram
        # settle w with a few Gibbs sweeps at theta0 so the conditional
        # target ll(theta | w) carries data information
        tausq_inv = jnp.full((m.q,), 1.0 / start_tausq, dtype=dt)
        XB0 = jnp.zeros((m.n + 1,), dtype=dt)

        def body(w, k):
            return gibbs_w(m, ld, w, tausq_inv, XB0, k), None

        w, _ = jax.lax.scan(body, w0, jax.random.split(key, n_warm_gibbs))

        # sequential map keeps one FD sweep's transients live at a time; the
        # fused quad path (quad_prev=ld) yields the new-factor quadratic form
        # without a standalone quad_loglik pass
        def one(z):
            th = transf_back(z, bnds)
            _l, _p, lgd, okz, q_new, _q = sweep(
                m, th, w, build_pred=False, quad_prev=ld
            )
            return jnp.where(okz, lgd + q_new, jnp.nan)

        lls = jax.lax.map(one, zs)
        return ld, pd, logdet, ok, gram, lls

    from spamtree_tpu.utils.execcache import cached_compile

    jitted = jax.jit(_prep)
    t0 = time.time()
    phases = {}
    compiled = cached_compile(
        jitted.lower(ms, theta0j, zs, jax.random.PRNGKey(seed)), phases
    )
    t1 = time.time()
    out = compiled(ms, theta0j, zs, jax.random.PRNGKey(seed))
    out = jax.block_until_ready(out)
    t2 = time.time()
    if timings is not None:
        timings["prepare_compile_s"] = round(t1 - t0, 2)
        timings["prepare_exec_cache"] = phases.get("exec_cache", "off")
        timings["prepare_run_s"] = round(t2 - t1, 2)
    if do_curvature:
        ld, pd, logdet, ok, gram, lls = out
        return (ld, pd, logdet, ok, gram), lls
    ld, pd, logdet, ok, gram = out
    return (ld, pd, logdet, ok, gram), None


def subsample_curvature_sd(
    cs: np.ndarray,
    mvs: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    spec,
    bounds: np.ndarray,
    theta0: np.ndarray,
    axis_cell_size,
    K,
    n_sub: int = 20000,
    n_warm_gibbs: int = 5,
    fd_step: float = 0.15,
    start_tausq: float = 0.1,
    seed: int = 0,
    timings: dict | None = None,
) -> np.ndarray:
    """Curvature proposal covariance from a SUBSAMPLED model, compiled for
    the local CPU backend -- zero remote-compile cost.

    On this machine every extra TPU program costs minutes of remote
    compilation; round-3 measurement showed the fused pre-MCMC program
    (prepare_chain) alone at ~360 s of compile for 0.3 s of run at n=1e5 --
    ~70% of time-to-first-sample.  The curvature diagonal is a HEURISTIC
    (initial RAM proposal metric; adaptation refines it), so it tolerates
    two approximations: estimate on min(n, n_sub) observed rows, and scale
    the curvature by n_obs/n_sub (the conditional log-likelihood Hessian
    grows ~linearly in data size).  The small model compiles locally on the
    CPU backend in seconds.

    Also validates that theta0 passes the likelihood-sweep Cholesky on the
    subsample (the start-value check init_state's eager sweep used to do).

    Returns the (nt, nt) diagonal proposal covariance.
    """
    t0 = time.time()
    nt = len(theta0)
    obs = np.flatnonzero(np.isfinite(np.asarray(ys, dtype=np.float64)))
    if len(obs) > n_sub:
        sel = np.sort(np.random.default_rng(seed).choice(
            obs, size=n_sub, replace=False))
    else:
        sel = obs
    n_eff = len(sel)
    scale_n = len(obs) / max(n_eff, 1)

    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tree = make_tree(
            cs[sel], np.ones(n_eff, dtype=bool), np.asarray(mvs)[sel],
            axis_cell_size=axis_cell_size, K=K,
            rng=np.random.default_rng(seed),
        )
        sched = build_schedule(tree)
        ms = ModelStatic(sched, cs[sel], np.asarray(mvs)[sel],
                         np.asarray(ys)[sel], np.asarray(xs)[sel], spec,
                         dtype=jnp.float32,
                         use_pallas=False)  # CPU backend: no Pallas lowering
        dt = ms.dtype
        bnds = jnp.asarray(bounds, dtype=dt)
        theta0j = jnp.asarray(theta0, dtype=dt)
        z0 = transf_fwd(theta0j, bnds)
        eye = jnp.eye(nt, dtype=dt)
        zs = jnp.concatenate([z0[None], z0 + fd_step * eye,
                              z0 - fd_step * eye])

        @jax.jit
        def _fd(m, theta, zs, key):
            w0 = jnp.zeros((m.n + 1,), dtype=dt)
            ld, _pd, _lgd, ok0 = sweep(m, theta, w0, build_pred=False)
            tausq_inv = jnp.full((m.q,), 1.0 / start_tausq, dtype=dt)
            XB0 = jnp.zeros((m.n + 1,), dtype=dt)

            def body(w, k):
                return gibbs_w(m, ld, w, tausq_inv, XB0, k), None

            w, _ = jax.lax.scan(body, w0,
                                jax.random.split(key, n_warm_gibbs))

            def one(z):
                th = transf_back(z, bnds)
                _l, _p, lgd, okz, q_new, _q = sweep(
                    m, th, w, build_pred=False, quad_prev=ld
                )
                return jnp.where(okz, lgd + q_new, jnp.nan)

            return ok0, jax.lax.map(one, zs)

        ok0, lls = jax.block_until_ready(
            _fd(ms, theta0j, zs, jax.random.PRNGKey(seed))
        )
    if not bool(ok0):
        raise RuntimeError(
            "starting theta fails Cholesky in the likelihood sweep "
            "(subsampled check); choose a different starting value or widen "
            "the bounds"
        )
    if timings is not None:
        timings["cpu_tuner_s"] = round(time.time() - t0, 2)
        timings["cpu_tuner_n"] = n_eff
    return curvature_sd_from_lls(lls, nt, fd_step=fd_step,
                                 curv_scale=scale_n)
