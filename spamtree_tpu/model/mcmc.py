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
    gibbs_beta,
    gibbs_tausq,
    gibbs_w,
    predict,
    predict_recompute,
    quad_loglik,
    sweep,
)
from spamtree_tpu.model.ram import RAMState, ram_adapt, ram_init
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
    burn_chunk: int = 100  # burn iterations per device call (bounds call time)
    ram_reference_warmup: bool = False  # reproduce the reference's RAM warmup
    # informative theta prior: callable logp(theta) or per-dim spec list (see
    # model/priors.py).  None = flat, the reference's effective behavior (it
    # computes calc_prior_logratio but never adds it; spamtree_fit.cpp:239-246)
    theta_prior: object = None


def init_state(
    ms: ModelStatic,
    bounds: np.ndarray,
    start_theta: np.ndarray,
    start_beta: np.ndarray | None = None,
    start_tausq: float = 0.1,
    start_w: np.ndarray | None = None,
    cfg: MCMCConfig = MCMCConfig(),
    seed: int = 0,
) -> MCMCState:
    n, p, q = ms.n, ms.p, ms.q
    nt = len(start_theta)
    theta = jnp.asarray(start_theta, dtype=ms.dtype)
    beta0 = np.zeros(p) if start_beta is None else np.asarray(start_beta)
    beta = jnp.asarray(np.repeat(beta0[:, None], q, axis=1), dtype=ms.dtype)
    tausq_inv = jnp.full((q,), 1.0 / start_tausq, dtype=ms.dtype)
    w0 = np.zeros(n + 1) if start_w is None else np.append(np.asarray(start_w), 0.0)
    w = jnp.asarray(w0, dtype=ms.dtype)
    XBq = ms.X @ beta
    XB = jnp.append(jnp.sum(XBq * ms.mv_onehot, axis=1), jnp.zeros((1,), dtype=ms.dtype))
    sd = np.asarray(cfg.mcmcsd)
    if sd.ndim < 2:
        sd = np.eye(nt) * float(sd)
    ram = ram_init(jnp.asarray(sd, dtype=ms.dtype))
    b = np.asarray(bounds, dtype=np.float64)
    st = np.asarray(start_theta, dtype=np.float64)
    if np.any(st <= b[:, 0]) or np.any(st >= b[:, 1]):
        raise ValueError(
            f"starting theta outside its bounds: theta={st}, bounds={b.tolist()}"
        )
    leveldata, pred_data, logdet, ok = jax.jit(
        lambda m, th, ww: sweep(m, th, ww)
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
        it=jnp.zeros((), dtype=jnp.int32),
    )


def make_step(ms: ModelStatic, bounds: np.ndarray, cfg: MCMCConfig):
    """Build the single-iteration transition kernel (closure over statics)."""
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

        if cfg.sample_w:
            w = gibbs_w(ms, leveldata, w, state.tausq_inv, state.XB, kw)

        if cfg.sample_theta:
            U = jax.random.normal(kt, (theta.shape[0],), dtype=ms.dtype)
            prop = transf_back(transf_fwd(theta, bnds) + ram.paramsd @ U, bnds)
            prop, _ = clamp_bounds(prop, bnds)
            # both quadratic forms (proposal and current factors) are fused
            # into the proposal sweep's level loop -- no standalone
            # quad_loglik passes over the stored factors
            new_ld, new_pd, new_logdet, ok, q_new, q_cur = sweep(
                ms, prop, w, quad_prev=leveldata
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
            theta = jnp.where(accepted, prop, theta)
            logdetCi = jnp.where(accepted, new_logdet, logdetCi)
            leveldata = jax.tree.map(
                lambda a, b: jnp.where(accepted, a, b), new_ld, leveldata
            )
            if pred_data is not None:
                pred_data = jax.tree.map(
                    lambda a, b: jnp.where(accepted, a, b), new_pd, pred_data
                )
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

        if predicting and cfg.sample_predicts and cfg.sample_w:
            if ms.pred_in_carry:
                w = predict(ms, pred_data, w, kp)
            else:
                w = predict_recompute(ms, theta, w, kp)

        tausq_inv = state.tausq_inv
        if cfg.sample_tausq:
            tausq_inv = gibbs_tausq(ms, w, state.XB, kq, cfg.tausq_ab)

        beta, XB = state.beta, state.XB
        if cfg.sample_beta:
            beta, XB = gibbs_beta(ms, w, tausq_inv, kb, Vi, Vim)

        return MCMCState(
            key=state.key, w=w, beta=beta, tausq_inv=tausq_inv, XB=XB,
            theta=theta, leveldata=leveldata, pred_data=pred_data,
            logdetCi=logdetCi, ram=ram, it=state.it + 1,
        )

    return step


def run_mcmc(
    ms: ModelStatic,
    bounds: np.ndarray,
    cfg: MCMCConfig,
    state: MCMCState,
    verbose: bool = False,
    precompile: bool = False,
    checkpoint_path: str | None = None,
    sink_dir: str | None = None,
    const_model: bool | None = None,
):
    """Burn + chunked keep phases; returns dict of host-side sample arrays.

    Interruptible between chunks (partial results are returned), mirroring the
    reference's checkInterrupt polling (spamtree_fit.cpp:336,355-360).
    If ``checkpoint_path`` is set, the full sampler state is written there
    after the burn phase and after every kept chunk (resume via
    utils.checkpoint.load_state).
    """
    import os

    n = ms.n

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
            getattr(ms, "approx_device_bytes", float("inf")) <= limit
        )

    def _burn_body(m, s, keys):
        st = make_step(m, bounds, cfg)
        return jax.lax.scan(lambda ss, k: (st(ss, k, False), None), s, keys)[0]

    def _keep_body(m, s, keys):
        st = make_step(m, bounds, cfg)

        # yhat = XB + w + tau*z is reconstructed on the HOST from (w, beta,
        # tausq): the device->host link is the bottleneck at large n
        # (measured ~20 MB/s through the relay vs ~30 ms/iteration compute),
        # so only w rides the wire, not the redundant yhat
        def keep_body(s, keys):
            for i in range(cfg.thin - 1):
                s = st(s, keys[i], False)
            s = st(s, keys[cfg.thin - 1], True)
            out = (s.w[:n], s.beta, 1.0 / s.tausq_inv, s.theta)
            return s, out

        return jax.lax.scan(keep_body, s, keys)

    if const_model:
        _burn_c = partial(jax.jit, donate_argnums=0)(partial(_burn_body, ms))
        _keep_c = partial(jax.jit, donate_argnums=0)(partial(_keep_body, ms))
        burn_scan = lambda m, s, keys: _burn_c(s, keys)
        keep_scan = lambda m, s, keys: _keep_c(s, keys)
        _lower_burn = lambda m, s, keys: _burn_c.lower(s, keys)
        _lower_keep = lambda m, s, keys: _keep_c.lower(s, keys)
        _wrap = lambda ex: (lambda m, s, keys: ex(s, keys))
    else:
        burn_scan = partial(jax.jit, donate_argnums=1)(_burn_body)
        keep_scan = partial(jax.jit, donate_argnums=1)(_keep_body)
        _lower_burn, _lower_keep = burn_scan.lower, keep_scan.lower
        _wrap = lambda ex: ex

    # host-side data for the yhat reconstruction (one-time small fetches)
    X_h = np.asarray(ms.X)
    mv_h = np.asarray(ms.mv[:n])
    onehot_h = np.asarray(ms.mv_onehot[:n])
    yhat_rng = np.random.default_rng(int(np.asarray(state.key).ravel()[-1]))

    def _yhat_host(w_s, beta_s, tausq_s):
        """(m, n) posterior-predictive draws: X beta + w + tau z, exactly the
        reference's spamtree_fit.cpp:384 with host RNG for z."""
        XBq = np.einsum("np,kpq->knq", X_h, beta_s)
        XB = np.einsum("knq,nq->kn", XBq, onehot_h)
        sd = np.sqrt(tausq_s[:, mv_h])  # (m, n) per-row margin noise sd
        z = yhat_rng.standard_normal(w_s.shape, dtype=np.float32)
        return XB + w_s + sd * z

    # burn runs in bounded-length device calls: keeps single XLA executions
    # short (relay/watchdog friendly at large n) and allows progress +
    # checkpointing mid-burn
    bc = min(cfg.burn_chunk, cfg.burn) if cfg.burn > 0 else 0
    burn_fn = burn_scan
    keep_compiled = None
    keep_chunk_flops = 0.0
    if precompile:
        # AOT-compile the scans so mcmc_time measures sampling, not XLA
        t_c = time.time()
        if bc > 0:
            dk = jax.random.split(jax.random.PRNGKey(0), bc)
            burn_fn = _wrap(_lower_burn(ms, state, dk).compile())
        m0 = min(cfg.chunk, cfg.keep)
        dk2 = jax.random.split(jax.random.PRNGKey(0), m0 * (cfg.thin + 1)).reshape(
            m0, cfg.thin + 1, 2
        )
        keep_exec = _lower_keep(ms, state, dk2).compile()
        keep_compiled = _wrap(keep_exec)
        if verbose:
            print(f"[compile] {time.time()-t_c:.1f}s")

        def _chunk_flops(ex):
            """XLA's own flop count for one compiled keep chunk (m0 kept
            samples x thin transitions each) -- for honest MFU reporting."""
            try:
                ca = ex.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                return float(ca.get("flops", 0.0))
            except Exception:
                return 0.0

        keep_chunk_flops = _chunk_flops(keep_exec)

    t0 = time.time()
    key = state.key
    burned = 0
    # rolling acceptance over the window since the last report, next to the
    # cumulative rate (reference: RAMAdapt::print/print_summary,
    # mh_adapt.h:137-148, printed from spamtree_fit.cpp:334-372)
    prev_acc, prev_prop, prev_t, prev_it = 0.0, 0.0, t0, 0

    def _report(phase, done, total, state, iters_done):
        nonlocal prev_acc, prev_prop, prev_t, prev_it
        jax.block_until_ready(state.w)
        acc, prop = float(state.ram.accept_count), float(state.ram.propos_count)
        cum = acc / max(prop, 1.0)
        roll = (acc - prev_acc) / max(prop - prev_prop, 1.0)
        now = time.time()
        ms_it = 1e3 * (now - prev_t) / max(iters_done - prev_it, 1)
        print(
            f"[{phase}] {done}/{total}, {now - t0:.2f}s, {ms_it:.1f}ms/iter, "
            f"accept {roll:.2%} (window) {cum:.2%} (cumulative)"
        )
        if int(verbose) >= 2:  # printall equivalent (spamtree_fit.cpp:344-350)
            th = np.asarray(state.theta)
            ts = 1.0 / np.asarray(state.tausq_inv)
            print(f"  theta = {np.array2string(th, precision=4)}")
            print(f"  tausq = {np.array2string(ts, precision=5)}")
        prev_acc, prev_prop, prev_t, prev_it = acc, prop, now, iters_done

    import os as _os

    _phase_dbg = bool(_os.environ.get("SPAMTREE_PHASE_DEBUG"))
    while burned < cfg.burn:
        _tc = time.time()
        b = min(bc, cfg.burn - burned)
        key, sub = jax.random.split(key)
        bkeys = jax.random.split(sub, b)
        state = (burn_fn if b == bc else burn_scan)(ms, state, bkeys)
        burned += b
        if _phase_dbg:
            _f = float(jnp.sum(state.theta))  # force (lazy relay)
            print(f"[dbg] burn chunk {burned}: {time.time()-_tc:.3f}s",
                  flush=True)
        if checkpoint_path:
            from spamtree_tpu.utils.checkpoint import save_state

            save_state(checkpoint_path, state._replace(key=key))
        if verbose:
            _report("burn", burned, cfg.burn, state, burned)
    state = state._replace(key=key)

    # with a sink, the big row-indexed draws (w, yhat) stream to disk on the
    # native writer thread instead of accumulating in host RAM (for n ~ 1e6)
    sinks = None
    if sink_dir is not None:
        import os

        from spamtree_tpu.utils.native import SampleSink

        os.makedirs(sink_dir, exist_ok=True)
        sinks = {k: SampleSink(os.path.join(sink_dir, f"{k}_mcmc.f32"))
                 for k in ("w", "yhat")}

    outs = {k: [] for k in ("w", "yhat", "beta", "tausq", "theta")}
    kept = 0
    drained = 0
    # pipelined drain: the next chunk is dispatched BEFORE the previous
    # chunk's samples are pulled to host, so the ~2 s/chunk device->host
    # transfer overlaps the ~3 s/chunk sampling compute.  Disabled when
    # checkpointing (the saved state must not run ahead of drained samples).
    pipeline = checkpoint_path is None
    pending = None  # device arrays of the previously dispatched chunk

    def _drain(dev_outs, m):
        nonlocal drained
        w_s, beta_s, tausq_s, theta_s = [np.asarray(a) for a in dev_outs]
        yhat_s = _yhat_host(w_s, beta_s, tausq_s)
        if sinks is not None:
            sinks["w"].push(w_s.astype(np.float32, copy=False))
            sinks["yhat"].push(yhat_s.astype(np.float32, copy=False))
        else:
            outs["w"].append(w_s)
            outs["yhat"].append(yhat_s)
        outs["beta"].append(beta_s)
        outs["tausq"].append(tausq_s)
        outs["theta"].append(theta_s)
        drained += m
        if not np.isfinite(theta_s).all():
            # reference aborts on NaN loglik (spamtree_fit.cpp:234-237)
            raise FloatingPointError(
                "non-finite theta in chain; aborting (NaN loglik guard)"
            )
        if checkpoint_path:
            from spamtree_tpu.utils.checkpoint import save_state

            save_state(checkpoint_path, state)
        if verbose:
            _report("keep", drained, cfg.keep, state,
                    cfg.burn + drained * cfg.thin)

    try:
        while kept < cfg.keep or pending is not None:
            cur = None
            m = 0
            if kept < cfg.keep:
                m = min(cfg.chunk, cfg.keep - kept)
                key, sub = jax.random.split(key)
                ckeys = jax.random.split(sub, m * (cfg.thin + 1)).reshape(
                    m, cfg.thin + 1, 2
                )
                fn = (keep_compiled
                      if (keep_compiled is not None
                          and m == min(cfg.chunk, cfg.keep))
                      else keep_scan)
                state, cur = fn(ms, state, ckeys)
                state = state._replace(key=key)
                kept += m
                for a in cur:  # start the async device->host copies early
                    try:
                        a.copy_to_host_async()
                    except Exception:
                        pass
            if pending is not None:
                _drain(*pending)
                pending = None
            if pipeline:
                pending = (cur, m) if cur is not None else None
            elif cur is not None:
                _drain(cur, m)
    except KeyboardInterrupt:
        print("MCMC interrupted; returning partial results.")

    if sinks is not None:
        for k, sk in sinks.items():
            sk.close()
    res = {k: (np.concatenate(v) if v else np.zeros((0,))) for k, v in outs.items()}
    if sinks is not None:
        res["sink_files"] = {k: sk.path for k, sk in sinks.items()}
    res["mcmc_time"] = time.time() - t0
    res["paramsd"] = np.asarray(state.ram.paramsd)
    res["accept_ratio"] = float(state.ram.accept_count) / max(
        float(state.ram.propos_count), 1
    )
    if keep_chunk_flops:
        res["flops_per_kept_sample"] = keep_chunk_flops / min(cfg.chunk, cfg.keep)
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
    const_model: bool | None = None,
):
    """Run C independent chains in one program via vmap -- the multi-chain
    analog of ``run_mcmc`` with the same engineering: chunked burn (bounded
    device-call length), AOT precompile, checkpointing, sample sinks.

    Per-chain randomness derives from each chain's own ``state.key`` (set the
    chain seeds in ``init_state``), so chains are independent streams and the
    user seed matters.  With a device mesh, chains shard over the ``chains``
    axis (pure data parallelism the reference cannot do; its driver loop is
    one chain, spamtree_fit.cpp:167-391).  Outputs carry a chain axis after
    the sample axis: w/yhat (keep, C, n), beta (keep, C, p, q), etc.
    """
    n = ms.n
    C = int(np.asarray(states.theta).shape[0])

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
        import os

        limit = float(os.environ.get("SPAMTREE_CONST_LIMIT", 128e6))
        const_model = (
            mesh is None
            and getattr(ms, "approx_device_bytes", float("inf")) <= limit
        )

    def _burn_body(m, s, keys):  # keys (b, C, 2)
        st = make_step(m, bounds, cfg)
        vstep = jax.vmap(lambda ss, k: st(ss, k, False))
        return jax.lax.scan(lambda ss, k: (vstep(ss, k), None), s, keys)[0]

    def _keep_body(m, s, keys):
        st = make_step(m, bounds, cfg)
        vstep_b = jax.vmap(lambda ss, k: st(ss, k, False))
        vstep_p = jax.vmap(lambda ss, k: st(ss, k, True))

        # yhat reconstructed host-side from (w, beta, tausq), as in run_mcmc
        def keep_body(s, keys):  # keys (thin+1, C, 2)
            for i in range(cfg.thin - 1):
                s = vstep_b(s, keys[i])
            s = vstep_p(s, keys[cfg.thin - 1])
            return s, (s.w[:, :n], s.beta, 1.0 / s.tausq_inv, s.theta)

        return jax.lax.scan(keep_body, s, keys)

    if const_model:
        _burn_c = partial(jax.jit, donate_argnums=0)(partial(_burn_body, ms))
        _keep_c = partial(jax.jit, donate_argnums=0)(partial(_keep_body, ms))
        burn_scan = lambda m, s, keys: _burn_c(s, keys)
        keep_scan = lambda m, s, keys: _keep_c(s, keys)
        _lower_burn = lambda m, s, keys: _burn_c.lower(s, keys)
        _lower_keep = lambda m, s, keys: _keep_c.lower(s, keys)
        _wrap = lambda ex: (lambda m, s, keys: ex(s, keys))
    else:
        burn_scan = partial(jax.jit, donate_argnums=1)(_burn_body)
        keep_scan = partial(jax.jit, donate_argnums=1)(_keep_body)
        _lower_burn, _lower_keep = burn_scan.lower, keep_scan.lower
        _wrap = lambda ex: ex

    X_h = np.asarray(ms.X)
    mv_h = np.asarray(ms.mv[:n])
    onehot_h = np.asarray(ms.mv_onehot[:n])
    yhat_rng = np.random.default_rng(
        int(np.asarray(states.key).ravel()[-1])
    )

    def _yhat_host(w_s, beta_s, tausq_s):
        """(m, C, n) posterior-predictive draws (host RNG for the noise)."""
        XBq = np.einsum("np,mcpq->mcnq", X_h, beta_s)
        XB = np.einsum("mcnq,nq->mcn", XBq, onehot_h)
        sd = np.sqrt(tausq_s[:, :, mv_h])  # (m, C, n)
        z = yhat_rng.standard_normal(w_s.shape, dtype=np.float32)
        return XB + w_s + sd * z

    # per-chain key streams: split each chain's carried key into (next key,
    # m iteration keys) -- the user's per-chain seeds drive everything
    @partial(jax.jit, static_argnums=1)
    def _next_keys_burn(chainkeys, m):  # (C, 2) -> (C, 2), (m, C, 2)
        ks = jax.vmap(lambda k: jax.random.split(k, m + 1))(chainkeys)
        return ks[:, 0], jnp.moveaxis(ks[:, 1:], 0, 1)

    @partial(jax.jit, static_argnums=1)
    def _next_keys_keep(chainkeys, m):  # -> (C, 2), (m, thin+1, C, 2)
        ks = jax.vmap(
            lambda k: jax.random.split(k, m * (cfg.thin + 1) + 1)
        )(chainkeys)
        it = ks[:, 1:].reshape(C, m, cfg.thin + 1, 2)
        return ks[:, 0], jnp.moveaxis(it, 0, 2)

    bc = min(cfg.burn_chunk, cfg.burn) if cfg.burn > 0 else 0
    burn_fn, keep_compiled = burn_scan, None
    if precompile:
        t_c = time.time()
        ck = jnp.asarray(np.asarray(states.key))
        if bc > 0:
            _, dk = _next_keys_burn(ck, bc)
            burn_fn = _wrap(_lower_burn(ms, states, _shard_keys(dk)).compile())
        m0 = min(cfg.chunk, cfg.keep)
        _, dk2 = _next_keys_keep(ck, m0)
        keep_compiled = _wrap(
            _lower_keep(ms, states, _shard_keys(dk2)).compile()
        )
        if verbose:
            print(f"[compile] {time.time()-t_c:.1f}s")

    def _save(states, chainkeys):
        if checkpoint_path:
            from spamtree_tpu.utils.checkpoint import save_state

            save_state(checkpoint_path, states._replace(key=chainkeys))

    t0 = time.time()
    chainkeys = states.key
    burned = 0
    while burned < cfg.burn:
        b = min(bc, cfg.burn - burned)
        chainkeys, bkeys = _next_keys_burn(chainkeys, b)
        states = (burn_fn if b == bc else burn_scan)(
            ms, states, _shard_keys(bkeys)
        )
        burned += b
        _save(states, chainkeys)
        if verbose:
            jax.block_until_ready(states.w)
            acc = float(np.sum(np.asarray(states.ram.accept_count)))
            prop = float(np.sum(np.asarray(states.ram.propos_count)))
            print(f"[burn] {burned}/{cfg.burn} x {C} chains, "
                  f"{time.time()-t0:.2f}s, accept {acc/max(prop,1):.2%}")
    states = states._replace(key=chainkeys)

    sinks = None
    if sink_dir is not None:
        import os

        from spamtree_tpu.utils.native import SampleSink

        os.makedirs(sink_dir, exist_ok=True)
        sinks = {k: SampleSink(os.path.join(sink_dir, f"{k}_mcmc.f32"))
                 for k in ("w", "yhat")}

    outs = {k: [] for k in ("w", "yhat", "beta", "tausq", "theta")}
    kept = 0
    drained = 0
    pipeline = checkpoint_path is None  # see run_mcmc
    pending = None

    def _drain(dev_outs, m):
        nonlocal drained
        w_s, beta_s, tausq_s, theta_s = [np.asarray(a) for a in dev_outs]
        yhat_s = _yhat_host(w_s, beta_s, tausq_s)
        if sinks is not None:
            sinks["w"].push(w_s.astype(np.float32, copy=False))
            sinks["yhat"].push(yhat_s.astype(np.float32, copy=False))
        else:
            outs["w"].append(w_s)
            outs["yhat"].append(yhat_s)
        outs["beta"].append(beta_s)
        outs["tausq"].append(tausq_s)
        outs["theta"].append(theta_s)
        drained += m
        if not np.isfinite(theta_s).all():
            raise FloatingPointError(
                "non-finite theta in chain; aborting (NaN loglik guard)"
            )
        _save(states, chainkeys)
        if verbose:
            print(f"[keep] {drained}/{cfg.keep} x {C} chains, "
                  f"{time.time()-t0:.2f}s")

    try:
        while kept < cfg.keep or pending is not None:
            cur = None
            m = 0
            if kept < cfg.keep:
                m = min(cfg.chunk, cfg.keep - kept)
                chainkeys, ckeys = _next_keys_keep(chainkeys, m)
                fn = (keep_compiled
                      if keep_compiled is not None
                      and m == min(cfg.chunk, cfg.keep)
                      else keep_scan)
                states, cur = fn(ms, states, _shard_keys(ckeys))
                states = states._replace(key=chainkeys)
                kept += m
                for a in cur:
                    try:
                        a.copy_to_host_async()
                    except Exception:
                        pass
            if pending is not None:
                _drain(*pending)
                pending = None
            if pipeline:
                pending = (cur, m) if cur is not None else None
            elif cur is not None:
                _drain(cur, m)
    except KeyboardInterrupt:
        print("MCMC interrupted; returning partial results.")

    if sinks is not None:
        for sk in sinks.values():
            sk.close()
    res = {k: (np.concatenate(v) if v else np.zeros((0,))) for k, v in outs.items()}
    if sinks is not None:
        res["sink_files"] = {k: sk.path for k, sk in sinks.items()}
    res["mcmc_time"] = time.time() - t0
    res["paramsd"] = np.asarray(states.ram.paramsd)
    res["accept_ratio"] = float(np.sum(np.asarray(states.ram.accept_count))) / max(
        float(np.sum(np.asarray(states.ram.propos_count))), 1
    )
    res["accept_by_chain"] = (
        np.asarray(states.ram.accept_count)
        / np.maximum(np.asarray(states.ram.propos_count), 1)
    )
    res["state"] = states
    return res
