"""Jit-compiled MCMC loop for the SpamTree model.

Equivalent of the reference driver ``spamtree_mv_mcmc``
(reference: src/spamtree_fit.cpp:5-429).  Iteration order matches the
reference hot loop (.cpp:167-391): w-Gibbs -> cheap re-loglik -> RAM-adaptive
Metropolis on theta (with logit transforms + jacobian; chol failure
auto-rejects) -> prediction on kept iterations -> tausq-Gibbs -> beta-Gibbs ->
sample save.  Burn and keep phases are separate ``lax.scan``s; kept samples
stream to host in chunks so n ~ 10^6 runs never hold the full chain on device.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spamtree_tpu.model.core import (
    ModelStatic,
    _ms_flatten,
    _ms_unflatten,
    gibbs_beta,
    gibbs_beta_tausq,
    gibbs_tausq,
    gibbs_w,
    level_coords,
    msg_gram,
    gram_full,
    route_gram,
    pred_operators_from_joint,
    predict,
    predict_recompute,
    quad_loglik,
    sweep,
)
from spamtree_tpu.model.ram import RAMState, ram_adapt, ram_init
from spamtree_tpu.utils.execcache import cached_compile
from spamtree_tpu.model.transforms import calc_jacobian, clamp_bounds, transf_back, transf_fwd


class MCMCState(NamedTuple):
    key: jax.Array
    w: jax.Array  # (n+1,)
    beta: jax.Array  # (p, q)
    tausq_inv: jax.Array  # (q,)
    XB: jax.Array  # (n+1,)
    theta: jax.Array
    leveldata: tuple
    pred_data: object  # LevelData of prediction operators (or None)
    logdetCi: jax.Array
    ram: RAMState
    it: jax.Array  # iteration counter for RAM warmup
    # (core.msg_gram, core.route_gram) pair: per-segment Gibbs-message Gram
    # blocks + their precomputed per-level routed Sigi sums, refreshed only
    # on theta acceptance; () disables the carried-gram path (vmapped chains:
    # lax.cond degenerates to both-branches under vmap, so chains recompute
    # in place inside gibbs_w instead)
    gram: tuple = ()


class MCMCConfig(NamedTuple):
    keep: int = 1000
    burn: int = 100
    thin: int = 1
    adapting: bool = True
    mcmcsd: float = 0.01
    tausq_ab: tuple = (2.01, 1.0)
    beta_Vi: object = 0.01  # prior precision for beta: scalar s (Vi = s*I) or (p,p)
    sample_beta: bool = True
    sample_tausq: bool = True
    sample_theta: bool = True
    sample_w: bool = True
    sample_predicts: bool = True
    chunk: int = 50  # kept samples per device->host transfer chunk
    # deprecated: burn now runs through the SAME compiled program as keep
    # (chunks of chunk*thin iterations with prediction gated off at runtime),
    # so there is exactly one minutes-long XLA compile per run; burn_chunk is
    # accepted for API compatibility but ignored
    burn_chunk: int = 100
    ram_reference_warmup: bool = False  # reproduce the reference's RAM warmup
    # "all" stores every kept draw of w/yhat; "summary" accumulates running
    # mean/variance on DEVICE and ships only O(n) totals at the end -- the
    # large-n mode (keep*n draws never cross the ~20 MB/s device->host link).
    # beta/tausq/theta draws are always stored (they are tiny).
    collect: str = "all"
    # summary mode only: additionally retain ~this many w/yhat draws (every
    # stride-th kept draw within each chunk, sliced INSIDE the compiled
    # chunk program so the wire stays O(summary_draws * n)) -- enough for
    # posterior quantiles/intervals, which pure moments cannot give.  0 =
    # moments only (the reference's list_qtile needs full draws; this is
    # the O(1)-memory substitute).
    summary_draws: int = 0
    # device->host wire format for the w draws.  None = auto: float16 when
    # the model runs float32 (the relay link is the bottleneck at large n;
    # f16's 2^-11 relative error is far below posterior noise), no cast
    # otherwise.  Pass "none" to disable or an explicit dtype name.
    wire_dtype: object = None
    # informative theta prior: callable logp(theta) or per-dim spec list (see
    # model/priors.py).  None = flat, the reference's effective behavior (it
    # computes calc_prior_logratio but never adds it; spamtree_fit.cpp:239-246)
    theta_prior: object = None
    # resume only (api.spamtree): pin the chunk size to the ORIGINAL run's
    # balanced mc so the continuation's chunk boundaries -- and therefore its
    # per-chunk RNG splits -- reproduce the uninterrupted run's exactly
    # (re-balancing the REMAINING keep can pick a different mc).  0 = auto.
    mc_fixed: int = 0
    # MEASUREMENT ONLY: None = real MH decision; 0/1 pins the theta accept
    # branch (still gated by the Cholesky ok flag) so the accept-cond's two
    # paths can be timed separately (examples/bisect_step_blocks.py)
    force_accept: object = None
    # MEASUREMENT ONLY: run the full MH decision (sweep + accept prob + RAM
    # adapt) but skip the install cond entirely -- isolates the cond+install
    # machinery from the decision math (examples/bisect_step_blocks.py)
    theta_no_install: bool = False
    # MEASUREMENT ONLY: the theta decision sweep consumes the PRE-Gibbs w
    # (state.w) instead of the just-sampled one, breaking the w-Gibbs ->
    # sweep data dependency so XLA may overlap the two blocks -- isolates
    # critical-path serialization from structural per-program overhead in
    # the w+theta composition probe (examples/probe_composition.py)
    theta_stale_w: bool = False
    # Accept-aware theta step (None = auto): the proposal runs a
    # DECISION-ONLY sweep (loglik + fused quadratic forms, no factor/H/prec
    # emission) and the factor-emitting rebuild runs INSIDE the accept
    # branch of the cond.  With the round-5 joint-w carry the two forms tie
    # at stationary acceptance (legacy 12.7 reject / 19.2 accept vs
    # accept-aware 10.7 / 25.4 -> expected 14.4 vs 14.7 ms at accept=.27,
    # BENCH_RESULTS round 5) while accept-aware's second sweep DOUBLES the
    # program in HLO (cold backend compile 32 -> 131 s in round 4, warm
    # exec-cache load 18 -> 28 s).  Auto therefore resolves to False
    # everywhere; pass True explicitly for low-acceptance chains where the
    # reject-path saving outweighs the compile cost.
    accept_aware: object = None
    # LIVE per-iteration theta/tausq printing from INSIDE the compiled step
    # (host callback), the reference's printall (spamtree_fit.cpp:344-350);
    # api.spamtree sets it at verbose >= 4.  verbose >= 3 keeps the
    # zero-cost drain-time variant (_Reporter.printall) instead -- the
    # callback stalls the device pipeline every iteration, so live mode is
    # a debugging tool, not a production knob.
    printall: bool = False


def init_state(
    ms: ModelStatic,
    bounds: np.ndarray,
    start_theta: np.ndarray,
    start_beta: np.ndarray | None = None,
    start_tausq: float = 0.1,
    start_w: np.ndarray | None = None,
    cfg: MCMCConfig = MCMCConfig(),
    seed: int = 0,
    precomputed: tuple | None = None,
    lazy: bool = False,
) -> MCMCState:
    """Build the initial sampler state.

    ``lazy=True`` skips the initial likelihood sweep entirely: leveldata /
    pred_data start as ZERO pytrees (shapes via ``jax.eval_shape``, no device
    compute) and ``logdetCi = -1e30``, so the first in-chain theta proposal
    that passes Cholesky accepts with probability 1 and installs real factors
    -- the chain self-initializes inside the already-compiled step program.
    The first burn iteration's w-Gibbs then samples from a no-spatial-prior
    conditional (finite, discarded in burn), which is why callers must only
    use lazy with burn >= 1 iteration and sample_theta on.  This removes the
    last pre-MCMC device program: on this machine every program costs
    minutes of remote XLA compilation (the reference's whole pre-MCMC phase
    is seconds of R, spamtree_fit.R:204-324)."""
    n, p, q = ms.n, ms.p, ms.q
    nt = len(start_theta)
    beta0 = np.zeros(p) if start_beta is None else np.asarray(start_beta)
    beta_h = np.repeat(beta0[:, None], q, axis=1)
    w_h = np.zeros(n + 1) if start_w is None else np.append(np.asarray(start_w), 0.0)
    sd = np.asarray(cfg.mcmcsd)
    if sd.ndim < 2:
        sd = np.eye(nt) * float(sd)
    b = np.asarray(bounds, dtype=np.float64)
    st = np.asarray(start_theta, dtype=np.float64)
    if np.any(st <= b[:, 0]) or np.any(st >= b[:, 1]):
        raise ValueError(
            f"starting theta outside its bounds: theta={st}, bounds={b.tolist()}"
        )
    if lazy:
        # ONE jitted program builds the whole state.  Constructing the zero
        # pytree leaf-by-leaf with jnp.zeros costs one tiny remote-compiled
        # dispatch per distinct shape on the axon backend (~40 of them, ~60 s
        # of the cold setup at n=1e5); the fused builder is a single fill
        # program, and is cached on the model so extra chains reuse it.
        dt = np.dtype(ms.dtype)
        build = _lazy_builder(ms, nt)
        return build(
            ms.X, ms.mv_onehot, np.int64(seed), w_h.astype(dt),
            beta_h.astype(dt), np.full((q,), 1.0 / start_tausq, dt),
            st.astype(dt), sd.astype(dt),
        )
    # the eager init sweep takes ms as a jit ARGUMENT; host-staged leaves
    # must be shipped first (one packed transfer, not one put per leaf)
    ms.materialize_device()
    theta = jnp.asarray(start_theta, dtype=ms.dtype)
    beta = jnp.asarray(beta_h, dtype=ms.dtype)
    tausq_inv = jnp.full((q,), 1.0 / start_tausq, dtype=ms.dtype)
    w = jnp.asarray(w_h, dtype=ms.dtype)
    XBq = ms.X @ beta
    XB = jnp.append(jnp.sum(XBq * ms.mv_onehot, axis=1), jnp.zeros((1,), dtype=ms.dtype))
    ram = ram_init(jnp.asarray(sd, dtype=ms.dtype))
    if precomputed is not None:
        # initial sweep already ran inside tuning.prepare_chain's single
        # compiled program (leveldata depends on theta only, not on w)
        if len(precomputed) == 5:
            leveldata, pred_data, logdet, ok, gram = precomputed
        else:
            leveldata, pred_data, logdet, ok = precomputed
            gram = jax.jit(gram_full)(ms, leveldata)
    else:
        def _init_sweep(m, th, ww):
            ld, pd, lg, okk = sweep(m, th, ww)
            return ld, pd, lg, okk, gram_full(m, ld)

        leveldata, pred_data, logdet, ok, gram = cached_compile(
            jax.jit(_init_sweep).lower(ms, theta, w)
        )(ms, theta, w)
    if not bool(ok):
        # mirror load_state: a start that fails Cholesky would otherwise
        # produce an all-NaN chain without tripping the finite-theta guard
        raise RuntimeError(
            "starting theta fails Cholesky in the initial likelihood sweep; "
            "choose a different starting value or widen the bounds"
        )
    return MCMCState(
        key=jax.random.PRNGKey(seed),
        w=w, beta=beta, tausq_inv=tausq_inv, XB=XB, theta=theta,
        leveldata=leveldata, pred_data=pred_data, logdetCi=logdet, ram=ram,
        it=jnp.zeros((), dtype=jnp.int32), gram=gram,
    )


def _lazy_builder(ms: ModelStatic, nt: int):
    """One jitted program that materializes the full lazy MCMCState (zero
    leveldata/pred_data + XB + RAM chol + PRNGKey).  Cached on the model
    instance so every chain reuses the same compiled program."""
    cache = ms.__dict__.setdefault("_lazy_init_cache", {})
    fn = cache.get(nt)
    if fn is not None:
        return fn
    th_s = jax.ShapeDtypeStruct((nt,), ms.dtype)
    w_s = jax.ShapeDtypeStruct((ms.n + 1,), ms.dtype)
    ld_s, pd_s, _lg, _ok = jax.eval_shape(
        lambda m, th, ww: sweep(m, th, ww), ms, th_s, w_s
    )
    g_s = jax.eval_shape(gram_full, ms, ld_s)

    def _build_impl(X, mv_onehot, seed, w, beta, tausq_inv, theta, sd):
        XB = jnp.append(
            jnp.sum((X @ beta) * mv_onehot, axis=1),
            jnp.zeros((1,), dtype=ms.dtype),
        )
        zero = lambda t: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), t
        )
        return MCMCState(
            key=jax.random.PRNGKey(seed),
            w=w, beta=beta, tausq_inv=tausq_inv, XB=XB, theta=theta,
            leveldata=zero(ld_s),
            pred_data=zero(pd_s) if pd_s is not None else None,
            logdetCi=jnp.asarray(-1e30, dtype=ms.dtype),
            ram=ram_init(sd),
            it=jnp.zeros((), dtype=jnp.int32),
            # zero gram is consistent with the zero factors; the first
            # accepted proposal installs the real blocks via the step's cond
            gram=zero(g_s),
        )

    def build(*args):
        # the fill program is a pure function of shapes, so its remote
        # compile (measured ~175 s cold even at n=4000) rides the
        # serialized-executable cache across processes
        ex = cache.get(("exec", nt))
        if ex is None:
            ex = cached_compile(jax.jit(_build_impl).lower(*args))
            cache[("exec", nt)] = ex
        return ex(*args)

    cache[nt] = build
    return build


def stack_chain_states(state: MCMCState, seeds) -> MCMCState:
    """Broadcast one chain state to C chains with per-chain RNG keys, as a
    single compiled program (a leaf-by-leaf jnp.stack costs one remote
    dispatch per leaf on this machine's axon backend)."""
    seeds = jnp.asarray(np.asarray(seeds, dtype=np.int64))

    # vmapped chains drop the carried gram: under vmap the accept-cond
    # degenerates to both-branches-always, so chains recompute the message
    # Gram blocks in place inside gibbs_w (state.gram == () selects that)
    state = state._replace(gram=())

    def _stack(st, sds):
        C = sds.shape[0]
        out = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (C,) + a.shape), st
        )
        return out._replace(key=jax.vmap(jax.random.PRNGKey)(sds))

    return cached_compile(jax.jit(_stack).lower(state, seeds))(state, seeds)


def make_step(ms: ModelStatic, bounds: np.ndarray, cfg: MCMCConfig,
              coords_cache=None):
    """Build the single-iteration transition kernel (closure over statics).

    ``coords_cache`` (core.level_coords, built OUTSIDE the iteration scan
    by the drivers) hoists the static per-level coordinate gathers out of
    the while loop -- required under vmapped chains, where XLA fails to
    hoist them itself (round-5 chains profile)."""
    bnds = jnp.asarray(bounds, dtype=ms.dtype)
    bvi = np.asarray(cfg.beta_Vi, dtype=np.float64)
    if bvi.ndim < 2:
        bvi = float(bvi) * np.eye(ms.p)
    Vi = jnp.asarray(bvi, dtype=ms.dtype)
    Vim = jnp.zeros((ms.p,), dtype=ms.dtype)
    from spamtree_tpu.model.priors import make_theta_prior

    prior_fn = make_theta_prior(cfg.theta_prior)

    def step(state: MCMCState, key, predicting: bool) -> MCMCState:
        kw, kt, ku, kp, kq, kb = jax.random.split(key, 6)
        w, leveldata, logdetCi, theta = state.w, state.leveldata, state.logdetCi, state.theta
        pred_data = state.pred_data
        ram = state.ram
        gram = state.gram
        use_gram = len(gram) > 0  # static: () = recompute-in-place mode

        if cfg.sample_w:
            # carried gram is the (msg_gram, route_gram) pair: per-segment
            # Gram blocks for the mean messages plus the precomputed
            # per-level Sigi routing sums (core.route_gram)
            w = gibbs_w(ms, leveldata, w, state.tausq_inv, state.XB, kw,
                        gram=gram[0] if use_gram else None,
                        routed=gram[1] if use_gram else None)

        if cfg.sample_theta:
            accept_aware = cfg.accept_aware
            if accept_aware is None:
                accept_aware = False  # see MCMCConfig.accept_aware (round 5)
            U = jax.random.normal(kt, (theta.shape[0],), dtype=ms.dtype)
            prop = transf_back(transf_fwd(theta, bnds) + ram.paramsd @ U, bnds)
            prop, _ = clamp_bounds(prop, bnds)
            w_sw = state.w if cfg.theta_stale_w else w  # measurement-only
            # both quadratic forms (proposal and current factors) are fused
            # into the proposal sweep's level loop -- no standalone
            # quad_loglik passes over the stored factors
            if accept_aware:
                # decision-only: no factor/H/prec emission, no pred joint
                new_logdet, ok, q_new, q_cur = sweep(
                    ms, prop, w_sw, quad_prev=leveldata, decision_only=True,
                    coords_cache=coords_cache,
                )
            else:
                new_ld, new_pj, new_logdet, ok, q_new, q_cur = sweep(
                    ms, prop, w_sw, quad_prev=leveldata, emit_pred_joint=True,
                    coords_cache=coords_cache,
                )
            cur_ll = logdetCi + q_cur
            new_ll = new_logdet + q_new
            jac = calc_jacobian(prop, theta, bnds)
            logaccept = new_ll - cur_ll + jac
            if prior_fn is not None:
                logaccept = logaccept + prior_fn(prop) - prior_fn(theta)
            finite = jnp.isfinite(logaccept)
            acceptp = jnp.where(finite, jnp.exp(jnp.minimum(logaccept, 0.0)), 0.0)
            u = jax.random.uniform(ku, dtype=ms.dtype)
            accepted = (u < acceptp) & ok
            if cfg.force_accept is not None:  # measurement-only pin
                accepted = jnp.asarray(bool(cfg.force_accept)) & ok
            # The factor swap and the derived-from-factors state (prediction
            # operators, message Gram blocks -- pure in (theta, factors))
            # all resolve in ONE accept-cond: a rejected iteration forwards
            # the old buffers (vs jnp.where's read-both-write-one over the
            # ~155 MB factor set at n=1e5) and skips both derived builds.
            # (Vmapped chains execute both cond branches -- same cost as an
            # always-build -- and carry gram=() to opt out of the Gram half.)
            refresh_pred = pred_data is not None

            def _forward(_):
                return (
                    state.theta,
                    state.logdetCi,
                    state.leveldata,
                    state.gram if use_gram else (),
                    state.pred_data if refresh_pred else None,
                )

            if cfg.theta_no_install:
                # measurement-only (see MCMCConfig): full decision math, no
                # install cond.  Tie the decision scalar into the carry so
                # the sweep isn't DCE'd; all carried state stays as-is.
                logdetCi = logdetCi + 0.0 * jnp.where(
                    accepted, new_logdet, logdetCi
                )
                new_gram, new_pred = gram, pred_data
            elif accept_aware:
                # the factor-emitting rebuild runs INSIDE the accept branch:
                # only the ~27% accepted proposals pay it, and the reject
                # branch is a pure identity on the carried buffers.  theta
                # and logdetCi resolve in the same cond so the carried
                # (logdetCi, factors) pair always comes from ONE sweep.
                def _on_accept(op):
                    prop_ = op
                    ld_, pj_, lg2, ok2 = sweep(
                        ms, prop_, w_sw, build_pred=refresh_pred,
                        emit_pred_joint=True, coords_cache=coords_cache,
                    )

                    def _install(_):
                        return (
                            prop_,
                            lg2,
                            ld_,
                            gram_full(ms, ld_) if use_gram else (),
                            pred_operators_from_joint(
                                ms, prop_, pj_, coords_cache)
                            if refresh_pred else None,
                        )

                    # the rebuild re-runs the decision sweep's math; ok2
                    # can only diverge from the decision ok at a borderline
                    # Cholesky (compiler fusion ulps) -- forward the old
                    # state then, never install non-finite factors
                    return jax.lax.cond(ok2, _install, _forward, None)

                theta, logdetCi, leveldata, new_gram, new_pred = jax.lax.cond(
                    accepted, _on_accept, _forward, prop
                )
            else:
                theta = jnp.where(accepted, prop, theta)
                logdetCi = jnp.where(accepted, new_logdet, logdetCi)

                def _on_accept(op):
                    prop_, pj_, ld_ = op
                    return (
                        ld_,
                        gram_full(ms, ld_) if use_gram else (),
                        pred_operators_from_joint(ms, prop_, pj_,
                                                  coords_cache)
                        if refresh_pred else None,
                    )

                leveldata, new_gram, new_pred = jax.lax.cond(
                    accepted, _on_accept, lambda op: _forward(None)[2:],
                    (prop, new_pj, new_ld),
                )
            if use_gram:
                gram = new_gram
            if refresh_pred:
                pred_data = new_pred
            if cfg.adapting:
                alpha = jnp.where(
                    ok & finite, jnp.minimum(1.0, jnp.exp(logaccept)), 0.0
                )
                ram = ram_adapt(ram, U, alpha, state.it,
                                reference_warmup=cfg.ram_reference_warmup)
            ram = ram._replace(
                propos_count=ram.propos_count + 1.0,
                accept_count=ram.accept_count + accepted.astype(ms.dtype),
            )

        if cfg.sample_predicts and cfg.sample_w:
            # ``predicting`` may be a Python bool (staged out when False) or a
            # traced bool: a traced flag lets ONE compiled program serve both
            # the burn and keep phases (prediction skipped at runtime via
            # lax.cond), halving the number of minutes-long XLA compiles
            if isinstance(predicting, bool):
                if predicting:
                    w = (predict(ms, pred_data, w, kp) if ms.pred_in_carry
                         else predict_recompute(ms, theta, w, kp,
                                                coords_cache))
            else:
                pfn = ((lambda ww: predict(ms, pred_data, ww, kp))
                       if ms.pred_in_carry
                       else (lambda ww: predict_recompute(ms, theta, ww, kp,
                                                          coords_cache)))
                w = jax.lax.cond(predicting, pfn, lambda ww: ww, w)

        tausq_inv = state.tausq_inv
        beta, XB = state.beta, state.XB
        if cfg.sample_tausq and cfg.sample_beta:
            # fused conjugate tail: both O(n) reductions in one GEMM, the
            # tiny per-margin solve chain in one unrolled kernel
            # (core.gibbs_beta_tausq; same draws as the separate calls)
            tausq_inv, beta, XB = gibbs_beta_tausq(
                ms, w, state.XB, kq, kb, cfg.tausq_ab, Vi, Vim
            )
        else:
            if cfg.sample_tausq:
                tausq_inv = gibbs_tausq(ms, w, state.XB, kq, cfg.tausq_ab)
            if cfg.sample_beta:
                beta, XB = gibbs_beta(ms, w, tausq_inv, kb, Vi, Vim)

        if cfg.printall:
            # live per-iteration report (reference printall,
            # spamtree_fit.cpp:344-350); ordered so lines interleave in
            # iteration order within the scan
            jax.debug.print(
                "    it {it}: theta={th} tausq={tq}",
                it=state.it + 1, th=theta, tq=1.0 / tausq_inv, ordered=True,
            )

        return MCMCState(
            key=state.key, w=w, beta=beta, tausq_inv=tausq_inv, XB=XB,
            theta=theta, leveldata=leveldata, pred_data=pred_data,
            logdetCi=logdetCi, ram=ram, it=state.it + 1, gram=gram,
        )

    return step


class Moments(NamedTuple):
    """Device-side running sums for summary-only collection (O(n) output
    regardless of keep -- the large-n alternative to shipping every draw)."""

    count: jax.Array  # scalar, kept samples accumulated
    w_sum: jax.Array  # (..., n)
    w_sq: jax.Array
    yh_sum: jax.Array
    yh_sq: jax.Array


def _resolve_wire(cfg: MCMCConfig, ms: ModelStatic):
    """Device->host dtype for the w draws (None = ship at model dtype)."""
    wd = cfg.wire_dtype
    if wd is None:  # auto: halve the relay bytes for f32 models
        return jnp.float16 if ms.dtype == jnp.float32 else None
    if wd in (False, "none", "off"):
        return None
    d = jnp.dtype(wd)
    return None if d == jnp.dtype(ms.dtype) else d


def _moments_zero(ms: ModelStatic, lead=()) -> Moments:
    z = lambda: jnp.zeros(lead + (ms.n,), dtype=ms.dtype)
    return Moments(jnp.zeros((), dtype=ms.dtype), z(), z(), z(), z())


def chunk_sizes(cfg: MCMCConfig):
    """The balanced chunk-geometry numbers (mc, ipc, n_keep_chunks,
    n_burn_chunks), shared by ``_chunk_geometry`` and by
    ``api.spamtree``'s resume decomposition -- the latter must reproduce
    the ORIGINAL run's burn_actual exactly (checkpoints land on its chunk
    boundaries), so there is exactly one copy of this arithmetic."""
    if cfg.keep > 0:
        if cfg.mc_fixed:
            mc = int(cfg.mc_fixed)
            n_keep_chunks = -(-cfg.keep // mc)
        else:
            n_keep_chunks = -(-cfg.keep // min(cfg.chunk, cfg.keep))
            mc = -(-cfg.keep // n_keep_chunks)
    else:
        n_keep_chunks = 0
        # burn-only continuations must honor the pin too: resumed burn
        # chunks otherwise land on different RNG-split boundaries
        mc = int(cfg.mc_fixed) if cfg.mc_fixed else cfg.chunk
    ipc = mc * cfg.thin
    n_burn_chunks = int(np.ceil(cfg.burn / ipc)) if cfg.burn > 0 else 0
    return mc, ipc, n_keep_chunks, n_burn_chunks


def _chunk_geometry(cfg: MCMCConfig, mesh):
    """Chunk geometry + per-chunk predicting flags, shared by ``run_mcmc``
    and ``run_mcmc_chains``: mc kept samples (= mc*thin iterations) per
    device call; burn rounds UP to whole chunks; a final keep chunk past
    ``cfg.keep`` has its tail rows' flags masked OFF, so the discarded
    transitions neither predict nor contribute to summary-mode moments
    (they are truncated from the drained arrays either way).

    The chunk size is BALANCED: ``cfg.chunk`` caps it, but mc is then
    shrunk to the smallest size covering ``keep`` in the same number of
    chunks, so the final chunk over-runs by at most n_chunks-1 kept slots
    total instead of up to mc-1 (keep=500/chunk=200 used to execute 600
    kept slots' worth of device iterations -- and ship their draw bytes
    through the ~20 MB/s relay -- for 500 kept; balanced mc=167 executes
    501)."""
    mc, ipc, n_keep_chunks, n_burn_chunks = chunk_sizes(cfg)
    fk = np.zeros(cfg.thin, dtype=bool)
    fk[-1] = True
    fl = np.broadcast_to(fk, (mc, cfg.thin)).copy()
    last_take = cfg.keep - (n_keep_chunks - 1) * mc if n_keep_chunks else mc
    fl_last = fl.copy()
    fl_last[last_take:] = False
    # jnp.asarray may ALIAS a host buffer on the CPU backend -- hand each
    # flags array its own copy, never a buffer that is mutated afterwards
    flags_burn = jnp.zeros((mc, cfg.thin), dtype=bool)
    flags_keep = jnp.asarray(fl)
    flags_last = jnp.asarray(fl_last)
    if mesh is not None:
        from spamtree_tpu.parallel.sharding import replicated

        flags_burn = replicated(mesh, flags_burn)
        flags_keep = replicated(mesh, flags_keep)
        flags_last = replicated(mesh, flags_last)
    return (mc, ipc, n_burn_chunks, n_burn_chunks * ipc, n_keep_chunks,
            flags_burn, flags_keep, flags_last)


def _subsample_plan(cfg: MCMCConfig, mc: int, summary: bool):
    """Summary-mode quantile-subsample plan (``summary_draws``), shared by
    both drivers.  The retained w rows are sliced INSIDE the chunk program
    with a static local stride, so only they cross the device->host wire --
    but a chunk-local slice cannot retain fewer than one row per chunk, so
    when the requested global stride exceeds the chunk length the plan adds
    a chunk-level stride: only every ``chunk_stride``-th chunk's subsample
    output is fetched at all (the skipped chunks' rows never cross the
    wire), keeping the total at ~summary_draws for any chunk geometry.
    Returns (sub_stride, chunk_stride); sub_stride 0 = subsample off."""
    if not (summary and cfg.summary_draws > 0 and cfg.keep > 0):
        return 0, 1
    g = max(1, int(np.ceil(cfg.keep / cfg.summary_draws)))  # global stride
    if g <= mc:
        return g, 1
    return mc, max(1, int(round(g / mc)))


def _out_keys(summary: bool, sub_stride: int):
    """Host-side collection keys, shared by both drivers."""
    if not summary:
        return ("w", "yhat", "beta", "tausq", "theta")
    return ("beta", "tausq", "theta") + (("w", "yhat") if sub_stride else ())


class _Reporter:
    """Rolling-window + cumulative acceptance reporting shared by both
    drivers (reference: RAMAdapt::print/print_summary, mh_adapt.h:137-148,
    printed from spamtree_fit.cpp:334-372).  ``chains=C`` switches the
    header to the aggregate-over-chains form and verbose>=2 to per-chain
    output."""

    def __init__(self, t0, verbose, chains=0):
        self.t0, self.verbose, self.C = t0, int(verbose), chains
        self.prev = dict(acc=0.0, prop=0.0, t=t0, it=0)

    def snap(self, st):
        """Tiny report fields as FRESH device buffers (the +0 escapes the
        carry's donation, so the snapshot stays valid across the next
        chunk's dispatch in pipelined mode) with async host copies; becomes
        ready exactly when its chunk finishes.  theta/tausq are snapped
        only when verbose >= 2 will print them -- each extra part is a
        per-chunk device dispatch on the hot loop."""
        parts = (st.ram.accept_count + 0, st.ram.propos_count + 0)
        if self.verbose >= 2:
            parts = parts + (st.theta + 0, 1.0 / st.tausq_inv)
        for a in parts:
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return parts

    def report(self, phase, done, total, snap, iters_done):
        p = self.prev
        acc_c = np.asarray(snap[0], dtype=np.float64)
        prop_c = np.asarray(snap[1], dtype=np.float64)
        acc, prop = float(acc_c.sum()), float(prop_c.sum())
        now = time.time()
        roll = (acc - p["acc"]) / max(prop - p["prop"], 1.0)
        ms_it = 1e3 * (now - p["t"]) / max(iters_done - p["it"], 1)
        hdr = f"{done}/{total}" + (f" x {self.C} chains" if self.C else "")
        print(f"[{phase}] {hdr}, {now - self.t0:.2f}s, {ms_it:.1f}ms/iter, "
              f"accept {roll:.2%} (window) {acc / max(prop, 1.0):.2%} "
              f"(cumulative)")
        if self.verbose >= 2 and len(snap) > 2:  # theta/tausq window report
            if self.C:
                by = acc_c / np.maximum(prop_c, 1.0)
                print(f"  accept by chain: "
                      f"{np.array2string(by, precision=3)}")
            print(f"  theta = "
                  f"{np.array2string(np.asarray(snap[2]), precision=4)}")
            print(f"  tausq = "
                  f"{np.array2string(np.asarray(snap[3]), precision=5)}")
        self.prev = dict(acc=acc, prop=prop, t=now, it=iters_done)

    def printall(self, theta_s, tausq_s, base):
        """verbose==3: per-kept-iteration theta/tausq, printed at drain time
        (the reference prints every iteration under printall,
        spamtree_fit.cpp:344-350); the values ride the existing transfer,
        costing nothing when off.  verbose>=4 switches to the LIVE in-step
        callback (MCMCConfig.printall) and suppresses this duplicate."""
        if self.verbose == 3:
            for i in range(theta_s.shape[0]):
                print(f"    it {base + i + 1}: theta="
                      f"{np.array2string(theta_s[i], precision=4)} tausq="
                      f"{np.array2string(tausq_s[i], precision=5)}")


def _make_yhat_host(ms: ModelStatic, n: int, rng):
    """Host-side posterior-predictive reconstruction shared by both drivers:
    yhat = X beta + w + tau z, exactly the reference's spamtree_fit.cpp:384
    with host RNG for z (only w rides the ~20 MB/s device->host wire; yhat
    is redundant bytes).  Works for (m, n) and (m, C, n) draw batches.
    Contracted one covariate at a time so the peak temporary matches the
    output shape (an einsum over q materialized an (m, ..., n, q) cube,
    multi-GB at n=1e6)."""
    X_h = np.asarray(ms.X)
    mv_h = np.asarray(ms.mv[:n])

    def _yhat_host(w_s, beta_s, tausq_s):
        XB = np.zeros(w_s.shape, dtype=w_s.dtype)
        for j in range(X_h.shape[1]):
            XB += beta_s[..., j, :][..., mv_h] * X_h[:, j]
        sd = np.sqrt(tausq_s[..., mv_h])  # per-row margin noise sd
        zdt = np.float64 if w_s.dtype == np.float64 else np.float32
        z = rng.standard_normal(w_s.shape, dtype=zdt)
        return XB + w_s + sd * z

    return _yhat_host


def _drain_samples(dev_outs, m_take, *, summary, wire, sinks, outs,
                   yhat_host):
    """Pull one chunk's device outputs to host (shared drain core): slice to
    the m_take samples actually kept, decode the wire dtype, rebuild yhat,
    route the big draws to sinks or RAM, store the small params.  Raises on
    a non-finite theta draw (reference aborts on NaN loglik,
    spamtree_fit.cpp:234-237).  Returns (theta_s, tausq_s) for reporting."""
    if summary:
        beta_s, tausq_s, theta_s = [np.asarray(a)[:m_take] for a in dev_outs]
    else:
        w_s, beta_s, tausq_s, theta_s = [
            np.asarray(a)[:m_take] for a in dev_outs
        ]
        if wire is not None:
            w_s = w_s.astype(np.float32)
        yhat_s = yhat_host(w_s, beta_s, tausq_s)
        if sinks is not None:
            sinks["w"].push(w_s.astype(np.float32, copy=False))
            sinks["yhat"].push(yhat_s.astype(np.float32, copy=False))
        else:
            outs["w"].append(w_s)
            outs["yhat"].append(yhat_s)
    outs["beta"].append(beta_s)
    outs["tausq"].append(tausq_s)
    outs["theta"].append(theta_s)
    if not np.isfinite(theta_s).all():
        raise FloatingPointError(
            "non-finite theta in chain; aborting (NaN loglik guard)"
        )
    return theta_s, tausq_s, beta_s


def _drain_subsample(w_sub_dev, m_take, stride, beta_s, tausq_s, *, wire,
                     outs, yhat_host):
    """Summary-mode quantile subsample: pull the chunk's strided w rows
    (already sliced on device -- only these rows cross the wire), rebuild
    their yhat, and store them as regular (thinned) draws."""
    sub_take = -(-m_take // stride)  # kept rows at local indices 0, s, 2s..
    w_s = np.asarray(w_sub_dev)[:sub_take]
    if wire is not None:
        w_s = w_s.astype(np.float32)
    pos = np.arange(sub_take) * stride
    outs["w"].append(w_s)
    outs["yhat"].append(yhat_host(w_s, beta_s[pos], tausq_s[pos]))


def _make_sinks(sink_dir, summary, sink_append):
    """Sample sinks for the big row-indexed draws (w, yhat): stream to disk
    on the native writer thread instead of accumulating in host RAM (for
    n ~ 1e6).  sink_append continues existing files (resumed runs)."""
    if sink_dir is None or summary:
        return None
    import os

    from spamtree_tpu.utils.native import SampleSink

    os.makedirs(sink_dir, exist_ok=True)
    return {k: SampleSink(os.path.join(sink_dir, f"{k}_mcmc.f32"),
                          append=sink_append)
            for k in ("w", "yhat")}


def _drain_loop(n_keep_chunks, dispatch, drain, pipeline):
    """The chunked keep loop shared by both drivers.  ``dispatch(ki)``
    launches chunk ki on device and returns the drain payload (device
    outputs still in flight -- async host copies already started);
    ``drain(*payload)`` blocks on them and stores the samples.

    In pipelined mode the drains run on a WORKER THREAD (bounded two
    chunks behind): the main thread dispatches chunks back-to-back so the
    device never idles between them, while the device->host transfers and
    the host-side work (f16 decode, yhat reconstruction, appends) proceed
    concurrently -- round 5 measured ~2 s/chunk of drain-side work that a
    depth-1 interleave left partially on the critical path (VERDICT item
    5).  Disabled when checkpointing: the saved state must never run
    ahead of the drained samples.

    KeyboardInterrupt keeps partial results, mirroring the reference's
    checkInterrupt polling (spamtree_fit.cpp:336,355-360); already-
    dispatched chunks are drained since they are paid for.  A diverged
    chain's non-finite-theta abort fires up to two chunks late in
    pipelined mode -- the documented cost of the overlap."""
    if not pipeline:
        try:
            for ki in range(n_keep_chunks):
                drain(*dispatch(ki))
        except KeyboardInterrupt:
            print("MCMC interrupted; returning partial results.")
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=2)
    fail: list = []

    def _worker():
        while True:
            item = q.get()
            if item is None:
                return
            try:
                drain(*item)
            except BaseException as e:  # propagate after join
                fail.append(e)
                return

    def _put(item) -> bool:
        # never block forever on a dead worker (failed drain stops it)
        while not fail:
            try:
                q.put(item, timeout=1.0)
                return True
            except queue.Full:
                continue
        return False

    t = threading.Thread(target=_worker, daemon=True)
    t.start()
    try:
        for ki in range(n_keep_chunks):
            if fail or not _put(dispatch(ki)):
                break
    except KeyboardInterrupt:
        print("MCMC interrupted; returning partial results.")
    finally:
        _put(None)
        t.join()
    if fail:
        raise fail[0]


def _summary_result(res, acc, empty_shape):
    """Finalize summary-mode collection (shared): running sums -> posterior
    mean/variance fields; the draw cubes come back empty unless the
    quantile subsample (summary_draws) already filled them."""
    cnt = max(float(np.asarray(acc.count)), 1.0)
    w_mean = np.asarray(acc.w_sum) / cnt
    yh_mean = np.asarray(acc.yh_sum) / cnt
    res["w_mean"] = w_mean
    res["w_var"] = np.maximum(np.asarray(acc.w_sq) / cnt - w_mean**2, 0.0)
    res["yhat_mean"] = yh_mean
    res["yhat_var"] = np.maximum(
        np.asarray(acc.yh_sq) / cnt - yh_mean**2, 0.0
    )
    res["summary_count"] = cnt
    if "w" not in res or res["w"].size == 0:
        # also normalizes the (0,) placeholder left by an interrupt before
        # the first drain when summary_draws was active
        res["w"] = np.zeros(empty_shape)
        res["yhat"] = np.zeros(empty_shape)


def _chunk_cost(ex):
    """XLA's own (flops, bytes accessed) for one compiled keep chunk --
    honest MFU and bandwidth-roofline utilization (the workload is
    bandwidth-bound, so bytes/s vs the measured HBM envelope is the
    meaningful utilization number; see examples/microbench_ops.py)."""
    try:
        ca = getattr(ex, "_spamtree_cached_cost", None)  # exec-cache hit
        if ca is None:
            ca = ex.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def _leaf_is_arg(a, thresh: float) -> bool:
    """Argument side of the hybrid split: every device-resident leaf (a
    literal would be fetched back host-side at lowering) and every host
    leaf above ``thresh`` bytes.  ``nbytes`` handles numpy and jax arrays
    alike and degrades to 0 (constant-fold) for non-array leaves."""
    return isinstance(a, jax.Array) or getattr(a, "nbytes", 0) > thresh


def _split_big_leaves(ms: ModelStatic, thresh: float | None = None):
    """Middle const-model point (``const_model="hybrid"``): model leaves
    above ``thresh`` bytes become jit ARGUMENTS, everything else folds into
    the program as literal constants.

    The O(n) cost of full const mode is the host-side lowering of the big
    leaves as dense literals (113 s of the 156 s cold setup at n=1e5,
    BENCH_r03 ``lower_s``) plus the resulting ~600 MB exec-cache entries;
    the measured win of const mode over argument mode comes from folding the
    SMALL static index/mask arrays into the program.  Splitting at ~1 MB
    keeps that folding while the program stays O(levels).

    Returns (big_leaves, rebuild) where ``rebuild(big_args)`` reassembles a
    ModelStatic from traced big leaves + constant small leaves.

    Leaves that already live on the DEVICE ride as arguments regardless of
    size: folding a device array as an mlir literal fetches its value back
    host-side (`ir_constant` -> `array._value`), and on this machine that
    fetch goes through the ~20 MB/s relay per leaf — a measured multi-minute
    lowering stall (round-4 faulthandler capture).  Only host-staged numpy
    leaves below ``thresh`` fold as constants; they lower locally."""
    import os as _os

    if thresh is None:
        thresh = float(_os.environ.get("SPAMTREE_HYBRID_CONST_BYTES", 1e6))
    arrays, static = _ms_flatten(ms)
    flat, treedef = jax.tree.flatten(arrays)
    # a model materialized BEFORE the split (eager init, checkpoint load)
    # has every leaf on device, which would silently degenerate hybrid to
    # pure argument mode; the host snapshot materialize_device() retains
    # restores the small leaves' constant-foldable numpy values (identical
    # numbers, just host-resident so they lower locally)
    host_flat = getattr(ms, "_host_leaves", None)
    if host_flat is not None and len(host_flat) == len(flat):
        flat = [
            h if (isinstance(a, jax.Array)
                  and getattr(h, "nbytes", thresh + 1) <= thresh) else a
            for a, h in zip(flat, host_flat)
        ]
    big_ix = tuple(
        i for i, a in enumerate(flat) if _leaf_is_arg(a, thresh)
    )
    big_set = set(big_ix)
    small = [None if i in big_set else a for i, a in enumerate(flat)]
    big = [flat[i] for i in big_ix]
    if not any(a is not None for a in small):
        import warnings

        warnings.warn(
            "const_model='hybrid' found no host-resident leaves to fold; "
            "running as pure argument mode (model was materialized to "
            "device before the split)", stacklevel=3,
        )

    def rebuild(big_args):
        f2 = list(small)
        for i, a in zip(big_ix, big_args):
            f2[i] = a
        return _ms_unflatten(static, jax.tree.unflatten(treedef, f2))

    return big, rebuild


def _model_mode_dispatch(const_model, ms: ModelStatic, _keep_body):
    """How the model reaches the chunk program: constants ("const" / True),
    arguments (False), or the hybrid middle point ("hybrid": big leaves as
    arguments, small index/mask leaves folded -- see _split_big_leaves).
    Returns (keep_scan, _lower_keep, _wrap), each with the uniform
    ``(ms, carry, xs)`` call signature."""
    if const_model == "hybrid":
        # do NOT materialize the model first: the split must see the
        # host-staged numpy leaves so the constant-folded small leaves
        # lower locally (a device-resident constant is fetched back
        # through the relay per leaf at lowering time — see
        # _split_big_leaves).  Only the big argument leaves go to device.
        _big, _rebuild = _split_big_leaves(ms)
        # ONE batched transfer for all big leaves: per-leaf puts through the
        # high-overhead device link are exactly what the packed-buffer
        # staging exists to avoid (core.py staging note: ~30 individual puts
        # at n~1e6 cost minutes); device-resident leaves pass through as-is
        _big = jax.device_put(_big)
        _keep_h = partial(jax.jit, donate_argnums=1)(
            lambda big_args, c, xs: _keep_body(_rebuild(big_args), c, xs)
        )
        return (
            lambda m, c, xs: _keep_h(_big, c, xs),
            lambda m, c, xs: _keep_h.lower(_big, c, xs),
            lambda ex: (lambda m, c, xs: ex(_big, c, xs)),
        )
    if const_model:
        _keep_c = partial(jax.jit, donate_argnums=0)(partial(_keep_body, ms))
        return (
            lambda m, c, xs: _keep_c(c, xs),
            lambda m, c, xs: _keep_c.lower(c, xs),
            lambda ex: (lambda m, c, xs: ex(c, xs)),
        )
    keep_scan = partial(jax.jit, donate_argnums=1)(_keep_body)
    return keep_scan, keep_scan.lower, (lambda ex: ex)


def run_mcmc(
    ms: ModelStatic,
    bounds: np.ndarray,
    cfg: MCMCConfig,
    state: MCMCState,
    verbose: bool = False,
    precompile: bool = False,
    checkpoint_path: str | None = None,
    sink_dir: str | None = None,
    sink_append: bool = False,
    const_model: bool | None = None,
    mesh=None,
    pre_burn_hook=None,
    init_moments=None,
    base_counts=(0, 0),
):
    """Burn + chunked keep phases; returns dict of host-side sample arrays.

    ``base_counts`` = (burn_done, kept_done) already executed by the run(s)
    this one continues (api.spamtree's resume path); checkpoints store the
    cumulative totals so a later resume never has to infer them from its
    own chunk geometry.

    ``pre_burn_hook(state) -> state`` (optional) runs after the program
    compile is issued but before the first burn dispatch -- the join point
    for work overlapped with the (minutes-long remote) compile, e.g. the
    CPU curvature tuner patching the placeholder RAM proposal
    (api.spamtree's lazy path).  It must preserve every leaf's aval.

    ONE compiled program serves both phases: burn runs the keep program in
    chunks of ``chunk*thin`` iterations with the prediction step gated off at
    runtime (traced ``predicting`` flag) and the emitted samples dropped
    without a host fetch.  Burn is therefore rounded UP to whole chunks (the
    actual count is returned as ``burn_actual``); on this machine every extra
    XLA program costs minutes of remote compilation, which dominated
    time-to-first-sample in round 2 (setup 1064s vs 63s sampling at n=1e5).

    Interruptible between chunks (partial results are returned), mirroring the
    reference's checkInterrupt polling (spamtree_fit.cpp:336,355-360).
    If ``checkpoint_path`` is set, the full sampler state is written there
    after every chunk (resume via utils.checkpoint.load_state).
    ``mesh`` shards the block axis over devices (inputs must already be
    placed via parallel.sharding.shard_model; chains stay at 1 here).
    """
    import os

    n = ms.n
    wire = _resolve_wire(cfg, ms)
    summary = cfg.collect == "summary"
    (mc, ipc, n_burn_chunks, burn_actual, n_keep_chunks,
     flags_burn, flags_keep, flags_last) = _chunk_geometry(cfg, mesh)
    # summary + summary_draws: every stride-th kept draw is also retained
    # (for quantiles); the slice happens INSIDE the chunk program, so only
    # ~summary_draws rows of (n,) ever cross the device->host wire (see
    # _subsample_plan for the stride > chunk case)
    sub_stride, sub_cstride = _subsample_plan(cfg, mc, summary)

    # Two ways to hand the model to XLA.  const_model=True closes over ms:
    # every model array is inlined into the program as a literal constant,
    # letting XLA fold the static index arrays and choose layouts freely
    # (measured 39 -> 31 ms/iteration at n=1e5) -- but program size becomes
    # O(n), which blows compile time and the remote-compile transport at
    # n ~ 1e6.  const_model=False passes ms as a pytree ARGUMENT, keeping
    # the program O(levels).  Default: constants while the model arrays fit
    # the SPAMTREE_CONST_LIMIT budget (128 MB).  The carry (leveldata
    # factors dominate: ~GBs at n=1e6) is donated either way so the old
    # state's buffers are reused in place.
    if const_model is None:
        limit = float(os.environ.get("SPAMTREE_CONST_LIMIT", 128e6))
        const_model = (
            mesh is None
            and getattr(ms, "approx_device_bytes", float("inf")) <= limit
        )
    if const_model != "hybrid" and not const_model:
        # argument mode passes ms's leaves to the program every dispatch;
        # they must live on device (no-op when already materialized/sharded)
        ms.materialize_device()

    def _keep_body(m, carry, xs):
        # static coordinate gathers hoisted structurally outside the scan
        st = make_step(m, bounds, cfg, coords_cache=level_coords(m))

        # yhat = XB + w + tau*z is reconstructed on the HOST from (w, beta,
        # tausq): the device->host link is the bottleneck at large n
        # (measured ~20 MB/s through the relay vs ~30 ms/iteration compute),
        # so only w rides the wire, not the redundant yhat.  In summary mode
        # yhat moments are instead accumulated on DEVICE (with device RNG for
        # the noise) and nothing row-indexed crosses the wire per sample.
        def body(carry, x):
            s, acc = carry
            keys, flags = x  # (thin+1, 2), (thin,) traced predicting flags
            if cfg.thin <= 2:
                # small thin unrolls: a nested scan at thin=2 measured a
                # SLOWER remote cold compile (84 -> 150 s backend at
                # config 3) than the 2x-unrolled body, so the scan form is
                # reserved for thin > 2 where the unroll multiple is real
                for i in range(cfg.thin):
                    s = st(s, keys[i], flags[i])
            else:
                s, _ = jax.lax.scan(
                    lambda ss, kf: (st(ss, kf[0], kf[1]), None),
                    s, (keys[: cfg.thin], flags),
                )
            if summary:
                # flags[-1] is True exactly on keep chunks: burn chunks run
                # the same program but contribute 0 to the moments
                upd = flags[cfg.thin - 1].astype(m.dtype)
                w_k = s.w[:n]
                tau_sd = jnp.sqrt(1.0 / s.tausq_inv)[m.mv[:n]]
                z = jax.random.normal(keys[cfg.thin], (n,), dtype=m.dtype)
                yh = s.XB[:n] + w_k + tau_sd * z
                acc = Moments(
                    count=acc.count + upd,
                    w_sum=acc.w_sum + upd * w_k,
                    w_sq=acc.w_sq + upd * (w_k * w_k),
                    yh_sum=acc.yh_sum + upd * yh,
                    yh_sq=acc.yh_sq + upd * (yh * yh),
                )
                out = (s.beta, 1.0 / s.tausq_inv, s.theta)
                if sub_stride:
                    out += ((w_k.astype(wire) if wire is not None else w_k),)
            else:
                out_w = s.w[:n].astype(wire) if wire is not None else s.w[:n]
                out = (out_w, s.beta, 1.0 / s.tausq_inv, s.theta)
            return (s, acc), out

        c2, ys = jax.lax.scan(body, carry, xs)
        if sub_stride:
            ys = (*ys[:3], ys[3][::sub_stride])
        return c2, ys

    keep_scan, _lower_keep, _wrap = _model_mode_dispatch(
        const_model, ms, _keep_body
    )

    def _keys_chunk(sub):
        ck = jax.random.split(sub, mc * (cfg.thin + 1)).reshape(
            mc, cfg.thin + 1, 2
        )
        if mesh is not None:
            from spamtree_tpu.parallel.sharding import replicated

            ck = replicated(mesh, ck)
        return ck

    # resumed summary runs continue their saved partial sums (init_moments
    # from checkpoint.load_moments); otherwise start at zero
    acc0 = ((init_moments if init_moments is not None else _moments_zero(ms))
            if summary else ())
    carry = (state, acc0)

    keep_compiled = None
    keep_chunk_flops = keep_chunk_bytes = 0.0
    compile_s = 0.0
    compile_phases = {}
    if precompile:
        # AOT-compile the single program so mcmc_time measures sampling
        t_c = time.time()
        dk = _keys_chunk(jax.random.PRNGKey(0))  # mesh-replicated when sharded
        lowered = _lower_keep(ms, carry, (dk, flags_keep))
        t_l = time.time()
        compile_phases = {}
        keep_exec = cached_compile(lowered, compile_phases)
        t_x = time.time()
        keep_compiled = _wrap(keep_exec)
        # cost_analysis blocks until the remote compile service actually
        # delivers the binary (.compile() above can return an async handle),
        # so it MUST sit inside the timed span -- outside it, a cold-cache
        # run books minutes of compile wait as "uninstrumented" setup
        keep_chunk_flops, keep_chunk_bytes = _chunk_cost(keep_exec)
        compile_s = time.time() - t_c
        # attribute the span: trace+lower (host Python/MLIR, scales with
        # const_model literal size), the cached_compile call (exec-cache
        # lookup, then cache hash + cache-entry load or remote compile
        # dispatch on a miss), and the cost_analysis wait (async
        # remote-compile delivery; ~0 on an exec-cache hit)
        compile_phases.update(
            lower_s=round(t_l - t_c, 2),
            backend_compile_s=round(t_x - t_l, 2),
            cost_wait_s=round(compile_s - (t_x - t_c), 2),
        )
        if verbose:
            print(f"[compile] {compile_s:.1f}s {compile_phases}")

    if pre_burn_hook is not None:
        state = pre_burn_hook(state)
        carry = (state, carry[1])

    # the init-state program executes asynchronously on the relay; the
    # caller dispatches it WITHOUT blocking (api.spamtree) so its whole
    # execution rides the compile wait above, exactly like the CPU tuner.
    # Block here -- after the compile -- so mcmc_time stays clean of init
    # work; the residual is what the overlap did not cover.  NOTHING above
    # this line may fetch a device value (lowering reads only avals).
    t_f = time.time()
    np.asarray(state.key)
    init_wait_s = round(time.time() - t_f, 2)

    # host-side yhat reconstruction (host RNG seeded from the chain key);
    # built AFTER the init-wait force: constructing it earlier would block
    # on the async init program before the compile and defeat the overlap
    yhat_rng = np.random.default_rng(int(np.asarray(state.key).ravel()[-1]))
    _yhat_host = _make_yhat_host(ms, n, yhat_rng)

    burn_done0, kept_done0 = base_counts
    t0 = time.time()
    key = state.key
    rep = _Reporter(t0, verbose)
    _phase_dbg = bool(os.environ.get("SPAMTREE_PHASE_DEBUG"))
    fn0 = lambda: keep_compiled if keep_compiled is not None else keep_scan
    for bi in range(n_burn_chunks):
        _tc = time.time()
        key, sub = jax.random.split(key)
        carry, _void = fn0()(ms, carry, (_keys_chunk(sub), flags_burn))
        del _void  # burn samples are never fetched; buffers free immediately
        if _phase_dbg:
            jax.block_until_ready(carry[0].theta)
            print(f"[dbg] burn chunk {bi + 1}: {time.time()-_tc:.3f}s",
                  flush=True)
        if checkpoint_path:
            from spamtree_tpu.utils.checkpoint import save_state

            save_state(checkpoint_path, carry[0]._replace(key=key),
                       moments=carry[1] if summary else None,
                       counts=(mc, burn_done0 + (bi + 1) * ipc, kept_done0,
                               cfg.thin))
        if verbose:
            rep.report("burn", (bi + 1) * ipc, burn_actual,
                       rep.snap(carry[0]), (bi + 1) * ipc)
    state, _acc = carry
    state = state._replace(key=key)
    carry = (state, _acc)

    sinks = _make_sinks(sink_dir, summary, sink_append)

    outs = {k: [] for k in _out_keys(summary, sub_stride)}
    drained = 0
    # pipelined drain (see _drain_loop); disabled when checkpointing so the
    # saved state never runs ahead of the drained samples
    pipeline = checkpoint_path is None

    def _dispatch(ki):
        nonlocal carry, state, key
        _tc = time.time()
        take = min(mc, cfg.keep - ki * mc)
        fl = flags_last if ki == n_keep_chunks - 1 else flags_keep
        key, sub = jax.random.split(key)
        carry, cur = fn0()(ms, carry, (_keys_chunk(sub), fl))
        state, _acc = carry
        state = state._replace(key=key)
        carry = (state, _acc)
        if _phase_dbg:
            print(f"[dbg] keep chunk {ki}: dispatch {time.time()-_tc:.3f}s",
                  flush=True)
        # skipped-chunk subsample outputs are never fetched: no async copy,
        # nothing crosses the wire (see _subsample_plan)
        use_sub = bool(sub_stride) and ki % sub_cstride == 0
        for a in (cur if (not sub_stride or use_sub) else cur[:3]):
            try:  # start the async device->host copies early
                a.copy_to_host_async()
            except Exception:
                pass
        # the snap rides with the payload: in pipelined mode the live
        # `state` is already one dispatched chunk ahead at drain time, and
        # reporting from it makes the final report a zero-delta
        return cur, take, use_sub, rep.snap(state) if verbose else None

    def _drain(dev_outs, m_take, use_sub, rep_snap):
        nonlocal drained
        _tc = time.time()
        theta_s, tausq_s, beta_s = _drain_samples(
            dev_outs[:3] if sub_stride else dev_outs, m_take,
            summary=summary, wire=wire, sinks=sinks, outs=outs,
            yhat_host=_yhat_host,
        )
        if use_sub:
            _drain_subsample(dev_outs[3], m_take, sub_stride, beta_s,
                             tausq_s, wire=wire, outs=outs,
                             yhat_host=_yhat_host)
        drained += m_take
        if _phase_dbg:
            print(f"[dbg] keep drain -> {drained}: {time.time()-_tc:.3f}s",
                  flush=True)
        if checkpoint_path:
            from spamtree_tpu.utils.checkpoint import save_state

            # checkpointing disables pipelining, so the live state IS the
            # just-drained chunk's state here (and carry[1] its moments)
            save_state(checkpoint_path, state,
                       moments=carry[1] if summary else None,
                       counts=(mc, burn_done0 + burn_actual,
                               kept_done0 + drained, cfg.thin))
        if verbose:
            rep.report("keep", drained, cfg.keep, rep_snap,
                       burn_actual + drained * cfg.thin)
        rep.printall(theta_s, tausq_s, drained - theta_s.shape[0])

    _drain_loop(n_keep_chunks, _dispatch, _drain, pipeline)

    if sinks is not None:
        for sk in sinks.values():
            sk.close()
    res = {k: (np.concatenate(v) if v else np.zeros((0,))) for k, v in outs.items()}
    if sinks is not None:
        res["sink_files"] = {k: sk.path for k, sk in sinks.items()}
    if summary:
        _summary_result(res, carry[1], (0, n))
    res["burn_actual"] = burn_actual
    res["compile_time_s"] = round(compile_s, 2)
    res["compile_phases"] = compile_phases
    res["init_wait_s"] = init_wait_s
    res["mcmc_time"] = time.time() - t0
    res["paramsd"] = np.asarray(state.ram.paramsd)
    res["accept_ratio"] = float(state.ram.accept_count) / max(
        float(state.ram.propos_count), 1
    )
    if keep_chunk_flops:
        res["flops_per_kept_sample"] = keep_chunk_flops / mc
    if keep_chunk_bytes:
        res["bytes_per_kept_sample"] = keep_chunk_bytes / mc
    res["state"] = state
    return res


def run_mcmc_chains(
    ms: ModelStatic,
    bounds: np.ndarray,
    cfg: MCMCConfig,
    states: MCMCState,  # stacked pytree with leading chain axis C
    verbose: bool = False,
    mesh=None,
    precompile: bool = False,
    checkpoint_path: str | None = None,
    sink_dir: str | None = None,
    sink_append: bool = False,
    const_model: bool | None = None,
    pre_burn_hook=None,
    init_moments=None,
    base_counts=(0, 0),
):
    """Run C independent chains in one program via vmap -- the multi-chain
    analog of ``run_mcmc`` with the same engineering: chunked burn (bounded
    device-call length), AOT precompile, checkpointing, sample sinks,
    ``pre_burn_hook`` (see run_mcmc; here it patches the stacked states).

    Per-chain randomness derives from each chain's own ``state.key`` (set the
    chain seeds in ``init_state``), so chains are independent streams and the
    user seed matters.  With a device mesh, chains shard over the ``chains``
    axis (pure data parallelism the reference cannot do; its driver loop is
    one chain, spamtree_fit.cpp:167-391).  Outputs carry a chain axis after
    the sample axis: w/yhat (keep, C, n), beta (keep, C, p, q), etc.
    """
    import os

    n = ms.n
    # shape only -- np.asarray here would block on the async stack/init
    # programs before the compile is issued (see the init-wait note below)
    C = int(states.theta.shape[0])
    wire = _resolve_wire(cfg, ms)
    summary = cfg.collect == "summary"
    (mc, ipc, n_burn_chunks, burn_actual, n_keep_chunks,
     flags_burn, flags_keep, flags_last) = _chunk_geometry(cfg, mesh)
    # summary quantile subsample; see run_mcmc / _subsample_plan
    sub_stride, sub_cstride = _subsample_plan(cfg, mc, summary)

    if mesh is not None:
        from spamtree_tpu.parallel.sharding import chain_sharded

        states = chain_sharded(mesh, states)

    def _shard_keys(keys):
        if mesh is None:
            return keys
        from jax.sharding import NamedSharding, PartitionSpec as P

        # keys have the chain axis second-to-last: (..., C, 2)
        spec = P(*([None] * (keys.ndim - 2) + ["chains", None]))
        return jax.device_put(keys, NamedSharding(mesh, spec))

    # see run_mcmc: closure-constant model when small and unsharded (a
    # mesh-sharded model must stay a runtime argument)
    if const_model is None:
        limit = float(os.environ.get("SPAMTREE_CONST_LIMIT", 128e6))
        const_model = (
            mesh is None
            and getattr(ms, "approx_device_bytes", float("inf")) <= limit
        )
    if const_model != "hybrid" and not const_model:
        ms.materialize_device()  # see run_mcmc

    def _keep_body(m, carry, xs):
        # vmapped chains always resolve accept_aware=None to OFF: vmap
        # turns the accept-cond into both-branches-always (see MCMCConfig).
        # The coords cache is built OUTSIDE the vmap+scan: XLA does not
        # hoist these static gathers out of the vmapped while body itself
        # (6.4 ms/iteration each at n=1e5 C=2, round-5 chains profile)
        st = make_step(m, bounds, cfg if cfg.accept_aware is not None
                       else cfg._replace(accept_aware=False),
                       coords_cache=level_coords(m))
        # predicting flag stays UNBATCHED under the chain vmap (in_axes
        # None), so lax.cond survives vmap as a cond: burn chunks skip the
        # prediction work at runtime, exactly as in the single-chain path
        vstep = jax.vmap(st, in_axes=(0, 0, None))

        def body(carry, x):
            s, acc = carry
            keys, flags = x  # (thin+1, C, 2), (thin,)
            if cfg.thin <= 2:
                for i in range(cfg.thin):  # see run_mcmc thin note
                    s = vstep(s, keys[i], flags[i])
            else:
                s, _ = jax.lax.scan(
                    lambda ss, kf: (vstep(ss, kf[0], kf[1]), None),
                    s, (keys[: cfg.thin], flags),
                )
            if summary:
                upd = flags[cfg.thin - 1].astype(m.dtype)
                w_k = s.w[:, :n]  # (C, n)
                tau_sd = jnp.sqrt(1.0 / s.tausq_inv)[:, m.mv[:n]]
                z = jax.vmap(
                    lambda k: jax.random.normal(k, (n,), dtype=m.dtype)
                )(keys[cfg.thin])
                yh = s.XB[:, :n] + w_k + tau_sd * z
                acc = Moments(
                    count=acc.count + upd,
                    w_sum=acc.w_sum + upd * w_k,
                    w_sq=acc.w_sq + upd * (w_k * w_k),
                    yh_sum=acc.yh_sum + upd * yh,
                    yh_sq=acc.yh_sq + upd * (yh * yh),
                )
                out = (s.beta, 1.0 / s.tausq_inv, s.theta)
                if sub_stride:
                    out += ((w_k.astype(wire) if wire is not None else w_k),)
            else:
                out_w = (s.w[:, :n].astype(wire) if wire is not None
                         else s.w[:, :n])
                out = (out_w, s.beta, 1.0 / s.tausq_inv, s.theta)
            return (s, acc), out

        c2, ys = jax.lax.scan(body, carry, xs)
        if sub_stride:
            ys = (*ys[:3], ys[3][::sub_stride])
        return c2, ys

    keep_scan, _lower_keep, _wrap = _model_mode_dispatch(
        const_model, ms, _keep_body
    )

    # per-chain key streams: split each chain's carried key into (next key,
    # m iteration keys) -- the user's per-chain seeds drive everything
    @partial(jax.jit, static_argnums=1)
    def _next_keys_keep(chainkeys, m):  # -> (C, 2), (m, thin+1, C, 2)
        ks = jax.vmap(
            lambda k: jax.random.split(k, m * (cfg.thin + 1) + 1)
        )(chainkeys)
        it = ks[:, 1:].reshape(C, m, cfg.thin + 1, 2)
        return ks[:, 0], jnp.moveaxis(it, 0, 2)

    # resumed summary runs continue their saved partial sums (see run_mcmc)
    acc0 = ((init_moments if init_moments is not None
             else _moments_zero(ms, lead=(C,))) if summary else ())
    if summary and mesh is not None:
        from spamtree_tpu.parallel.sharding import chain_sharded

        acc0 = Moments(acc0.count,
                       *chain_sharded(mesh, tuple(acc0[1:])))
    carry = (states, acc0)

    keep_compiled = None
    keep_chunk_flops = keep_chunk_bytes = 0.0
    compile_s = 0.0
    compile_phases = {}
    if precompile:
        t_c = time.time()
        # lowering consumes only avals: a dummy key of the right
        # shape/dtype keeps this from blocking on the async stack/init
        # programs (np.asarray(states.key) here would serialize their
        # relay execution ahead of the compile)
        ck = jnp.zeros(tuple(states.key.shape), states.key.dtype)
        _, dk2 = _next_keys_keep(ck, mc)
        lowered = _lower_keep(ms, carry, (_shard_keys(dk2), flags_keep))
        t_l = time.time()
        compile_phases = {}
        keep_exec = cached_compile(lowered, compile_phases)
        t_x = time.time()
        keep_compiled = _wrap(keep_exec)
        # inside the timed span: cost_analysis blocks on the async remote
        # compile (see run_mcmc)
        keep_chunk_flops, keep_chunk_bytes = _chunk_cost(keep_exec)
        compile_s = time.time() - t_c
        compile_phases.update(
            lower_s=round(t_l - t_c, 2),
            backend_compile_s=round(t_x - t_l, 2),
            cost_wait_s=round(compile_s - (t_x - t_c), 2),
        )
        if verbose:
            print(f"[compile] {compile_s:.1f}s {compile_phases}")

    if pre_burn_hook is not None:
        states = pre_burn_hook(states)
        carry = (states, carry[1])

    # block on the async init/stack programs AFTER the compile was issued
    # (see run_mcmc): their relay execution rides the compile wait.
    # NOTHING above this line may fetch a device value.
    t_f = time.time()
    np.asarray(states.key)
    init_wait_s = round(time.time() - t_f, 2)

    # built AFTER the init-wait force (see run_mcmc)
    yhat_rng = np.random.default_rng(
        int(np.asarray(states.key).ravel()[-1])
    )
    _yhat_host = _make_yhat_host(ms, n, yhat_rng)  # (m, C, n) batches

    burn_done0, kept_done0 = base_counts

    def _save(states, chainkeys, counts):
        if checkpoint_path:
            from spamtree_tpu.utils.checkpoint import save_state

            # checkpointing disables pipelining, so carry[1] holds the
            # moments matching the saved states in summary mode
            save_state(checkpoint_path, states._replace(key=chainkeys),
                       moments=carry[1] if summary else None,
                       counts=counts)

    t0 = time.time()
    chainkeys = states.key
    fn0 = lambda: keep_compiled if keep_compiled is not None else keep_scan
    # rolling-window + cumulative acceptance aggregated over chains, same
    # reporting engineering as the single-chain driver (mh_adapt.h:137-148);
    # verbose>=2 adds the per-chain acceptance vector + per-chain theta/tausq
    rep = _Reporter(t0, verbose, chains=C)

    for bi in range(n_burn_chunks):
        chainkeys, bkeys = _next_keys_keep(chainkeys, mc)
        carry, _void = fn0()(ms, carry, (_shard_keys(bkeys), flags_burn))
        del _void
        _save(carry[0], chainkeys,
              (mc, burn_done0 + (bi + 1) * ipc, kept_done0, cfg.thin))
        if verbose:
            jax.block_until_ready(carry[0].w)
            rep.report("burn", (bi + 1) * ipc, burn_actual,
                       rep.snap(carry[0]), (bi + 1) * ipc)
    states, _acc = carry
    states = states._replace(key=chainkeys)
    carry = (states, _acc)

    sinks = _make_sinks(sink_dir, summary, sink_append)

    outs = {k: [] for k in _out_keys(summary, sub_stride)}
    drained = 0
    pipeline = checkpoint_path is None  # see _drain_loop

    def _dispatch(ki):
        nonlocal carry, states, chainkeys
        take = min(mc, cfg.keep - ki * mc)
        fl = flags_last if ki == n_keep_chunks - 1 else flags_keep
        chainkeys, ckeys = _next_keys_keep(chainkeys, mc)
        carry, cur = fn0()(ms, carry, (_shard_keys(ckeys), fl))
        states, _acc = carry
        states = states._replace(key=chainkeys)
        carry = (states, _acc)
        # skipped-chunk subsample outputs are never fetched (_subsample_plan)
        use_sub = bool(sub_stride) and ki % sub_cstride == 0
        for a in (cur if (not sub_stride or use_sub) else cur[:3]):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return cur, take, use_sub, rep.snap(states) if verbose else None

    def _drain(dev_outs, m_take, use_sub, rep_snap):
        nonlocal drained
        theta_s, tausq_s, beta_s = _drain_samples(
            dev_outs[:3] if sub_stride else dev_outs, m_take,
            summary=summary, wire=wire, sinks=sinks, outs=outs,
            yhat_host=_yhat_host,
        )
        if use_sub:
            _drain_subsample(dev_outs[3], m_take, sub_stride, beta_s,
                             tausq_s, wire=wire, outs=outs,
                             yhat_host=_yhat_host)
        drained += m_take
        _save(states, chainkeys,
              (mc, burn_done0 + burn_actual, kept_done0 + drained,
               cfg.thin))
        if verbose:
            rep.report("keep", drained, cfg.keep, rep_snap,
                       burn_actual + drained * cfg.thin)
        rep.printall(theta_s, tausq_s, drained - theta_s.shape[0])

    _drain_loop(n_keep_chunks, _dispatch, _drain, pipeline)

    if sinks is not None:
        for sk in sinks.values():
            sk.close()
    res = {k: (np.concatenate(v) if v else np.zeros((0,))) for k, v in outs.items()}
    if sinks is not None:
        res["sink_files"] = {k: sk.path for k, sk in sinks.items()}
    if summary:
        _summary_result(res, carry[1], (0, C, n))
    res["burn_actual"] = burn_actual
    res["compile_time_s"] = round(compile_s, 2)
    res["compile_phases"] = compile_phases
    res["init_wait_s"] = init_wait_s
    res["mcmc_time"] = time.time() - t0
    res["paramsd"] = np.asarray(states.ram.paramsd)
    res["accept_ratio"] = float(np.sum(np.asarray(states.ram.accept_count))) / max(
        float(np.sum(np.asarray(states.ram.propos_count))), 1
    )
    res["accept_by_chain"] = (
        np.asarray(states.ram.accept_count)
        / np.maximum(np.asarray(states.ram.propos_count), 1)
    )
    if keep_chunk_flops:
        res["flops_per_kept_sample"] = keep_chunk_flops / mc
    if keep_chunk_bytes:
        res["bytes_per_kept_sample"] = keep_chunk_bytes / mc
    res["state"] = states
    return res
