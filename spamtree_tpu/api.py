"""User-facing API: ``spamtree()`` fit+predict in one MCMC run.

Mirrors the reference front-end surface (reference: R/spamtree_fit.R:1-371):
same knobs (cell_size, K, start_level, tree_depth, last_not_reference,
limited_tree, cherrypick options, mvbias, mcmc/settings/prior/starting/debug
lists) and the same return fields (w_mcmc, yhat_mcmc, beta_mcmc, tausq_mcmc,
theta_mcmc, paramsd, mcmc_time, coordsinfo).

Fixes applied deliberately relative to the reference (SURVEY.md §7):
``prior$beta`` / ``prior$tausq`` are honored (the reference computed them but
hardcoded Vi=.01I and a=2.01; spamtree_fit.R:160-170 vs spamtree_model.cpp:157,
1401), and ``starting$w`` is honored (ignored upstream, spamtree_fit.R:264).
``prior["theta"]`` enables informative covariance-parameter priors (the
reference computes calc_prior_logratio but never adds it to the MH ratio;
spamtree_fit.cpp:239-246 -- pass None, the default, for parity).

Deliberately dropped: the reference's tied-coordinate grouping ``gix_block``
(spamtree_fit.R:271-279) is computed there but effectively unused in the live
C++ path (each location is its own group in practice), so this rebuild indexes
locations directly and does not reproduce it.
"""

from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from spamtree_tpu.model.core import ModelStatic
from spamtree_tpu.model.mcmc import MCMCConfig, init_state, run_mcmc
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _build_mesh(devices, n_chains):
    """chains x blocks mesh over the requested devices.

    The analog of the reference's one-knob parallelism (``num_threads``,
    reference: src/spamtree_fit.cpp:57-59): chains shard as pure data
    parallelism when they divide the device count, the rest of the devices
    shard the within-level block batches (the OpenMP-loop equivalent).
    """
    import jax
    from spamtree_tpu.parallel.sharding import make_mesh

    if devices in ("all", "auto"):
        devices = jax.devices()
    n_dev = len(devices)
    chains_ax = n_chains if (n_chains > 1 and n_dev % n_chains == 0) else 1
    return make_mesh(n_chains=chains_ax, n_blocks_shards=n_dev // chains_ax,
                     devices=devices)


def spamtree(
    y,
    x,
    coords,
    mv_id=None,
    elevation=False,
    cell_size=25,
    K=2,
    start_level=0,
    tree_depth=np.inf,
    last_not_reference=True,
    limited_tree=False,
    cherrypick_same_margin=True,
    cherrypick_group_locations=True,
    mvbias=0.0,
    mcmc=None,
    verbose=False,
    settings=None,
    prior=None,
    starting=None,
    debug=None,
    dtype=jnp.float32,
    seed=1,
    precompile=False,
    n_chains=1,
    checkpoint_path=None,
    resume_from=None,
    sink_dir=None,
    devices=None,
    mesh=None,
):
    """Fit a SpamTree model: fit + prediction in one MCMC run.

    Mirrors the reference front-end (reference: R/spamtree_fit.R:1-21,
    man/spamtree.Rd), with the same knob semantics:

    y : (n,) response; NaN rows are predicted (their latent w and yhat are
        sampled at kept iterations, reference predict_std).
    x : (n, p) covariates.
    coords : (n, dd) spatial coordinates (dd = 2 typical; any dd works).
    mv_id : (n,) outcome/margin ids for multivariate data (any label set;
        q = number of distinct labels).  None = univariate.
    elevation : with dd = 3 coordinates, treat the third column as elevation
        and use the AG10-with-elevation covariance (model 2,
        covariance_functions.cpp:138-209) instead of the nonspatial
        multi-input kernel.  The reference IMPLEMENTS model 2 but its
        front-end cannot reach it (dd==3 is rejected before dispatch,
        spamtree_fit.R:59-62); this knob makes the rebuild strictly broader.
    cell_size : target locations per tree block (reference axis_cell_size ^ dd).
    K : per-axis branching factor of the recursive partition.
    start_level, tree_depth, last_not_reference, limited_tree : tree shape
        knobs (reference make_tree.R); limited_tree keeps only the deepest
        reference ancestor as parent (1-parent recursive tree, the big-n mode).
    cherrypick_same_margin, cherrypick_group_locations, mvbias : knot
        selection details for misaligned multivariate sampling designs.
    mcmc : dict(keep=, burn=, thin=).
    settings : dict(adapting=, mcmcsd=, curvature_sd=, ram_reference_warmup=,
        const_model=, collect=, wire_dtype=, summary_draws=, factor_dtype=,
        lazy_init=, tuner_overlap=,
        chunk=).  chunk = kept samples per device->host transfer chunk
        (default 50): larger chunks amortize the per-dispatch round trip,
        smaller ones tighten checkpoint/interrupt granularity.
        mcmcsd None (default) uses a curvature-scaled initial proposal
        covariance (finite-difference Fisher diagonal at theta0); pass a
        scalar/matrix to override, or curvature_sd=False for the isotropic
        scale-aware fallback.  tuner_overlap (default None = auto) runs the
        CPU curvature tuner in a background thread overlapping the sampling
        program's remote compile; auto enables it on every backend except
        local CPU (where the two compiles contend for the same cores).
        collect="summary" accumulates posterior
        moments on device (O(n) output); summary_draws=m additionally
        retains ~m thinned w/yhat draws in w_mcmc/yhat_mcmc (sliced inside
        the compiled chunk program, so the wire stays O(m*n)) -- enough
        for posterior quantiles/intervals, which moments alone cannot
        give.  wire_dtype controls the
        device->host format of w draws (auto: float16 for f32 models).
        const_model: True bakes every model array into the program as
        literals (fastest per-iteration, O(n) program), False passes them
        as arguments (O(levels) program, required at n ~ 1e6), "hybrid"
        folds only leaves below ~1 MB and passes the big ones as arguments
        (seconds of lowering instead of minutes, MB-scale exec-cache
        entries), None = auto by model size.
        factor_dtype="bfloat16" (EXPERIMENTAL, off by default) stores the
        propagated joint factors -- the sweep's largest transients -- in
        bf16 with all math still at model dtype.  30.0 -> 27.6 ms/iteration
        at n=1e5, but at that scale the perturbation fails the Cholesky
        ok-gate on every proposal and freezes the theta chain (measured
        negative result, BENCH_RESULTS.md round 3); only usable at shallow
        tree depth.
    prior : dict(btmlim=, toplim=, vlim=, set_unif_bounds=, beta=, tausq=,
        theta=).  beta is the Normal prior precision (scalar s -> s*I or a
        (p,p) matrix); tausq is the inverse-Gamma (a, b); theta enables an
        informative covariance-parameter prior (per-dim spec list or callable,
        see model/priors.py) -- all three are honored here, unlike the
        reference which computes and drops them.
    starting : dict(beta=, tausq=, theta=, w=) warm starts (all honored).
    debug : dict(sample_beta=, sample_tausq=, sample_theta=, sample_w=,
        sample_predicts=) per-sampler ablation switches.
    dtype : device dtype (float32 production, float64 for parity checks).
    precompile : AOT-compile the scan programs before timing mcmc_time.
    n_chains : >1 vmaps independent chains (per-chain RNG; outputs gain a
        chain axis after the sample axis).
    checkpoint_path / sink_dir : full-state checkpoint file; directory for
        streaming w/yhat draws to disk instead of host RAM (n ~ 1e6).
    resume_from : path of a checkpoint written by an earlier run's
        ``checkpoint_path=``.  Call with the SAME data and knobs (the tree,
        schedule and chunk geometry are rebuilt from them); the sampler
        state -- w, beta, tausq, theta, RAM adapter, RNG key, iteration
        counter -- is loaded instead of initialized, curvature tuning is
        skipped, any remaining burn is skipped past, and only the REMAINING
        kept draws are sampled and returned (concatenate with the earlier
        partial results; with ``sink_dir`` new draws APPEND to the existing
        sink files, which end up as if the run was never interrupted).
        Checkpoints record the writing run's chunk size and cumulative
        (burn_done, kept_done), land on chunk boundaries, and carry the
        post-chunk RNG key; the continuation is pinned to the writing
        run's chunk size, so its w/beta/tausq/theta draws are
        bit-identical to an uninterrupted run with the same chunk
        geometry (yhat re-seeds its host noise stream).  ``keep`` may be
        RAISED on resume to extend a finished run with more draws.
        The reference has no equivalent (warm starts only, SURVEY.md §5).
    devices / mesh : multi-device execution, the analog of the reference's
        ``num_threads`` knob (spamtree_fit.cpp:57-59).  ``devices="all"``
        (or a device list) builds a chains x blocks ``jax.sharding.Mesh``
        over them and shards the per-level block batches (and the chains,
        when n_chains divides the device count); pass ``mesh=`` to supply
        your own.  On one device this is a no-op; the sharded math is
        bit-identical to unsharded (tests/test_sharding.py).  Default None
        runs on the default device.

    Returns a dict with w_mcmc, yhat_mcmc, beta_mcmc, tausq_mcmc, theta_mcmc,
    paramsd, mcmc_time, accept_ratio, coordsinfo and the order mapping
    (outputs are in sorted-row order; out["order"][i] is the original row).
    """
    if jnp.dtype(dtype) == np.float64:
        import jax

        if not jax.config.jax_enable_x64:
            # without x64, every jnp.zeros/asarray silently truncates to
            # float32 and the "float64" run is quietly single precision
            raise ValueError(
                "dtype=float64 requires the x64 mode: set "
                "jax.config.update('jax_enable_x64', True) (or the "
                "JAX_ENABLE_X64 env var) before calling spamtree()"
            )
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    coords = np.asarray(coords, dtype=np.float64)
    n, dd = coords.shape
    if mv_id is None:
        mv_id = np.ones(n, dtype=np.int64)
    mv_id = np.asarray(mv_id, dtype=np.int64)
    uniq = np.unique(mv_id)
    q = len(uniq)
    mv0 = np.searchsorted(uniq, mv_id)  # 0-based margin ids

    # merge each knob dict over its defaults, rejecting unknown keys: a
    # typo'd knob (e.g. settings=dict(checkpoint=...) for the
    # checkpoint_path= kwarg) must not silently run with defaults
    def _merge(name, defaults, given):
        unknown = set(given or {}) - set(defaults)
        if unknown:
            raise ValueError(
                f"unknown {name} key(s) {sorted(unknown)}; "
                f"valid: {sorted(defaults)}"
            )
        return defaults | (given or {})

    mcmc = _merge("mcmc", dict(keep=1000, burn=0, thin=1), mcmc)
    settings = _merge("settings", dict(
        adapting=True, mcmcsd=None, curvature_sd=True,
        ram_reference_warmup=False, const_model=None,
        collect="all", wire_dtype=None, summary_draws=0,
        factor_dtype=None, lazy_init=None, chunk=50,
        tuner_overlap=None), settings)
    prior = _merge("prior", dict(
        set_unif_bounds=None, btmlim=None, toplim=None, vlim=None,
        beta=None, tausq=None, theta=None), prior)
    starting = _merge(
        "starting", dict(beta=None, tausq=None, theta=None, w=None), starting)
    debug = _merge("debug", dict(
        sample_beta=True, sample_tausq=True, sample_theta=True,
        sample_w=True, sample_predicts=True), debug)

    # sort rows by coordinates then original index (reference: spamtree_fit.R:214)
    order = np.lexsort(
        tuple([np.arange(n)] + [coords[:, j] for j in range(dd - 1, -1, -1)])
    )
    ys, xs, cs, mvs = y[order], x[order], coords[order], mv0[order]
    na_which = np.isfinite(ys)

    if np.isscalar(cell_size):
        axis_size = int(round(cell_size ** (1.0 / dd)))
    else:
        axis_size = np.asarray(cell_size)

    tb = {}  # setup breakdown: seconds per pre-MCMC phase (bench/JSON)
    rng = np.random.default_rng(seed)
    t_ = time.time()
    tree = make_tree(
        cs, na_which, mvs,
        axis_cell_size=axis_size, K=K, start_level=start_level,
        tree_depth=tree_depth, last_not_reference=last_not_reference,
        limited_tree=limited_tree,
        cherrypick_same_margin=cherrypick_same_margin,
        cherrypick_group_locations=cherrypick_group_locations,
        mvbias=mvbias, rng=rng, verbose=verbose,
    )
    tb["tree_s"] = round(time.time() - t_, 2)
    t_ = time.time()
    sched = build_schedule(tree, limited_tree=limited_tree)
    tb["schedule_s"] = round(time.time() - t_, 2)

    start_theta = starting["theta"]
    if start_theta is None:
        # moment-based start instead of the reference's bounds midpoint
        # (reference starts at ~toplim/2 which takes thousands of iterations
        # to adapt away from at q > 1); pass starting=dict(theta=...) to
        # reproduce any specific start.
        from spamtree_tpu.model.params import auto_start_theta

        t_ = time.time()
        start_theta = auto_start_theta(dd, q, cs, ys, mvs,
                                       elevation=bool(elevation))
        tb["start_theta_s"] = round(time.time() - t_, 2)
    if elevation and dd != 3:
        raise ValueError(
            f"elevation=True needs 3 coordinate columns (x, y, elevation); "
            f"got dd={dd}"
        )
    tspec = make_theta_spec(
        dd, q,
        btmlim=prior["btmlim"] if prior["btmlim"] is not None else 1e-3,
        toplim=prior["toplim"] if prior["toplim"] is not None else 1e3,
        vlim=prior["vlim"],
        elevation=bool(elevation),
        set_unif_bounds=prior["set_unif_bounds"],
        start_theta=start_theta,
    )

    if mesh is None and devices is not None:
        mesh = _build_mesh(devices, n_chains)
    block_multiple = 1 if mesh is None else mesh.shape["blocks"]

    fd = settings["factor_dtype"]
    if fd in (None, False, "none", "off"):
        # measured NEGATIVE result at scale (BENCH_RESULTS.md round 3):
        # bf16-stored factors cut the in-scan step 30.0 -> 27.6 ms at n=1e5,
        # but at that depth the accumulated factor perturbation fails the
        # sweep's Cholesky ok-gate on every theta proposal -- the chain
        # freezes at 0% acceptance (n=600 parity tests cannot see this).
        # Storage stays at model dtype unless explicitly requested.
        fd = None
    t_ = time.time()
    ms = ModelStatic(sched, cs, mvs, ys, xs, tspec.spec, dtype=dtype,
                     block_multiple=block_multiple, factor_dtype=fd)
    if mesh is not None:
        from spamtree_tpu.parallel.sharding import shard_model

        ms = shard_model(ms, mesh)
    tb["stage_s"] = round(time.time() - t_, 2)

    # Pre-MCMC tuning + initial state.  The curvature-scaled initial proposal
    # covariance matters because rank-1 RAM is slow to learn per-dimension
    # scales in high-dim theta (15 dims at q=3), which froze round-1 chains
    # at 2-4% acceptance.  Two ways to get it:
    #
    # * lazy path (default whenever burn >= 1 and theta is sampled): the
    #   curvature diagonal comes from a SUBSAMPLED model compiled for the
    #   local CPU backend (seconds, zero remote compile), and the chain
    #   state self-initializes inside the step program (init_state(lazy=
    #   True): zero factors + logdetCi=-1e30 make the first ok proposal
    #   accept).  Exactly ONE remote-compiled program per run remains -- the
    #   sampling scan itself.  Round-3 measurement: the fused on-device
    #   pre-MCMC program cost 360 s of remote compile for 0.3 s of run.
    # * eager path (burn == 0, theta fixed, or settings["lazy_init"]=False):
    #   tuning.prepare_chain fuses the initial sweep + curvature batch into
    #   one on-device program, and every kept sample is exact from
    #   iteration 1.
    do_curv = bool(settings["mcmcsd"] is None and settings["curvature_sd"]
                   and debug["sample_theta"])
    start_tausq = 0.1 if starting["tausq"] is None else float(starting["tausq"])
    lazy = settings["lazy_init"]
    if lazy is None:
        lazy = mcmc["burn"] > 0 and debug["sample_theta"]
    elif lazy and not (mcmc["burn"] > 0 and debug["sample_theta"]):
        # lazy init relies on the in-chain theta step to install real
        # factors during burn (init_state docstring); without it every
        # w-Gibbs/prediction would silently use zero factors
        raise ValueError(
            "settings['lazy_init']=True requires burn >= 1 and "
            "debug['sample_theta']=True (the chain self-initializes inside "
            "the burn's theta step); use lazy_init=False here"
        )
    if resume_from is not None:
        # the checkpoint carries the adapted RAM proposal covariance and
        # live factors: no curvature tuning, no lazy self-init
        lazy = False
        do_curv = False
    tb["lazy_init"] = bool(lazy)
    precomputed = None
    tuner_join = None
    tuner_thread = None
    if resume_from is not None:
        pass  # load_state below rebuilds the factors with one sweep
    elif lazy:
        if do_curv:
            from spamtree_tpu.model.tuning import subsample_curvature_sd

            # The CPU curvature tuner (seconds) and the sampling scan's
            # remote compile (tens of seconds warm, minutes cold) have no
            # data dependency: the tuned proposal covariance is a RUNTIME
            # value of the chain state, never baked into the program.  Run
            # the tuner in a background thread and join it inside the
            # drivers' pre_burn_hook, AFTER the compile is issued -- the
            # tuner rides the compile wait instead of serializing before
            # it.  The state is built with the isotropic placeholder below
            # and its RAM proposal patched at the join (ram_set_proposal).
            # Auto-gated OFF on the local CPU backend: there the "remote"
            # compile runs on the same cores as the tuner and the two
            # concurrent XLA:CPU compiles contend (measured ~34% slower),
            # while on remote-compile backends the host sits idle.
            import jax

            def _run_tuner():
                return subsample_curvature_sd(
                    cs, mvs, ys, xs, tspec.spec, tspec.bounds, tspec.start,
                    axis_cell_size=axis_size, K=K, start_tausq=start_tausq,
                    seed=seed, timings=tb,
                )

            overlap = settings["tuner_overlap"]
            if overlap is None:
                overlap = jax.default_backend() != "cpu"
            if not overlap:
                settings["mcmcsd"] = _run_tuner()
        if do_curv and settings["mcmcsd"] is None:
            import threading

            _box = {}

            def _tune():
                try:
                    _box["sd"] = _run_tuner()
                except BaseException as e:  # re-raised at the join
                    _box["err"] = e

            tuner_thread = threading.Thread(target=_tune,
                                            name="spamtree-tuner",
                                            daemon=True)
            tuner_thread.start()

            def tuner_join():
                tuner_thread.join()
                if "err" in _box:
                    raise _box["err"]
                return _box["sd"]
    else:
        from spamtree_tpu.model.tuning import (
            curvature_sd_from_lls,
            prepare_chain,
        )

        precomputed, lls = prepare_chain(
            ms, tspec.bounds, tspec.start, do_curvature=do_curv,
            start_tausq=start_tausq, seed=seed, timings=tb,
        )
        if do_curv:
            settings["mcmcsd"] = curvature_sd_from_lls(lls, tspec.n_theta)
    if settings["mcmcsd"] is None:
        # scale-aware isotropic fallback: the theta posterior contracts
        # like 1/sqrt(n), so the reference's fixed 0.01 logit-scale
        # proposals are orders of magnitude too wide at large n.  When the
        # threaded curvature tuner is running this is only the PLACEHOLDER
        # the state is built with; the pre_burn_hook patches the real
        # proposal in before the first iteration.
        nt = tspec.n_theta
        settings["mcmcsd"] = min(
            0.01, 1.0 / (nt * np.sqrt(max(na_which.sum(), 1)))
        )
    elif do_curv and verbose:
        d = np.sqrt(np.diag(settings["mcmcsd"]))
        print(f"[tune] curvature proposal sd: {np.array2string(d, precision=4)}")
    beta_Vi = 0.01 if prior["beta"] is None else prior["beta"]
    tausq_ab = (2.01, 1.0) if prior["tausq"] is None else tuple(prior["tausq"])
    cfg = MCMCConfig(
        keep=mcmc["keep"], burn=mcmc["burn"], thin=mcmc["thin"],
        adapting=settings["adapting"], mcmcsd=settings["mcmcsd"],
        tausq_ab=tausq_ab, beta_Vi=beta_Vi,
        sample_beta=debug["sample_beta"], sample_tausq=debug["sample_tausq"],
        sample_theta=debug["sample_theta"], sample_w=debug["sample_w"],
        sample_predicts=debug["sample_predicts"],
        ram_reference_warmup=settings["ram_reference_warmup"],
        theta_prior=prior["theta"],
        collect=settings["collect"], wire_dtype=settings["wire_dtype"],
        summary_draws=int(settings["summary_draws"]),
        chunk=int(settings["chunk"]),
        # verbose>=3 prints per-iteration theta/tausq at drain time (free);
        # verbose>=4 prints LIVE from inside the step via a host callback
        printall=int(verbose) >= 4,
    )
    start_w = starting["w"]
    if start_w is not None:
        start_w = np.asarray(start_w).reshape(-1)[order]
    def _mk_state(sd):
        # the initial likelihood sweep already ran inside prepare_chain --
        # every chain starts from the same theta, so they share it
        return init_state(
            ms, tspec.bounds, tspec.start,
            start_beta=starting["beta"],
            start_tausq=start_tausq,
            start_w=start_w,
            cfg=cfg, seed=sd, precomputed=precomputed, lazy=lazy,
        )

    # NOTE: the state-builder program is dispatched here but NOT forced --
    # it executes asynchronously on the relay while the drivers lower and
    # compile the sampling scan, and they block on it only after the
    # compile is issued (run_mcmc's init-wait fetch, reported as
    # tb["init_wait_s"]).  Measured at n=1e5 the init execution is 20-55 s
    # of relay wait that now hides entirely behind the 12-36 s compile
    # load plus the tuner join, instead of serializing before them.

    resumed_it = kept_already = None
    state0 = None
    init_moments = None
    base_counts = (0, 0)
    if resume_from is not None:
        from spamtree_tpu.utils.checkpoint import load_moments, load_state

        t_ = time.time()
        state0 = load_state(resume_from, ms)
        if settings["collect"] == "summary":
            # continue the saved partial posterior sums: the draws they
            # summarize were never stored anywhere else
            init_moments = load_moments(resume_from, ms)
        tb["resume_load_s"] = round(time.time() - t_, 2)
        th = np.asarray(state0.theta)
        ck_chains = th.shape[0] if th.ndim == 2 else 1
        if ck_chains != n_chains:
            raise ValueError(
                f"checkpoint holds {ck_chains} chain(s); "
                f"n_chains={n_chains} was requested"
            )
        resumed_it = int(np.asarray(state0.it).ravel()[0])
        from spamtree_tpu.utils.checkpoint import load_counts

        counts = load_counts(resume_from)
        if counts is not None:
            # the checkpoint records the WRITING run's chunk size and its
            # cumulative (burn_done, kept_done) -- no inference needed.
            # Re-deriving the geometry from THIS call's cfg is wrong
            # whenever the two runs' keep values balance to different mc
            # (chunk_sizes depends on keep): burn_actual would shift and
            # kept draws would be silently mis-counted.
            from spamtree_tpu.model.mcmc import chunk_sizes

            _mc, burn_done, kept_done = counts[:3]
            if len(counts) >= 4 and counts[3] != cfg.thin:
                # iterations per chunk are mc*thin: a thin change shifts
                # burn_actual and every chunk/RNG boundary, so an "exact
                # continuation" under a different thin is a contradiction
                raise ValueError(
                    f"checkpoint was written with thin={counts[3]}; "
                    f"resuming with thin={cfg.thin} would silently shift "
                    f"the chunk boundaries and mis-count kept draws -- "
                    f"resume with the original thin"
                )
            # one copy of the burn-rounding arithmetic: chunk_sizes under
            # the writing run's pinned mc
            _, _ipc, _, _nb = chunk_sizes(cfg._replace(mc_fixed=_mc))
            rem_burn = max(_nb * _ipc - burn_done, 0)
            kept_already = min(kept_done, cfg.keep)
        else:
            # pre-counts checkpoint: decompose the iteration counter with
            # this call's chunk geometry (exact only when both runs' keep
            # values balance to the same mc -- always true for same-config
            # resumes); chains advance in lockstep, one counter covers all
            from spamtree_tpu.model.mcmc import chunk_sizes

            _mc, _ipc, _, _nb = chunk_sizes(cfg)
            _burn_actual = _nb * _ipc
            if resumed_it < _burn_actual:
                rem_burn, kept_already = _burn_actual - resumed_it, 0
            else:
                rem_burn = 0
                kept_already = min(
                    (resumed_it - _burn_actual) // cfg.thin, cfg.keep
                )
        if kept_already >= cfg.keep and rem_burn == 0:
            # keep=0 burn-priming runs resume as long as burn remains
            raise ValueError(
                f"checkpoint at iteration {resumed_it} already holds all "
                f"{cfg.keep} kept draws for this mcmc config; nothing to "
                f"resume"
            )
        if (settings["collect"] == "summary" and kept_already > 0
                and init_moments is None):
            # the draws behind kept_already were never stored; without the
            # saved partial sums the summary would silently cover only the
            # post-resume draws while reporting kept_total over all of them
            raise ValueError(
                f"checkpoint at iteration {resumed_it} holds {kept_already} "
                f"kept draws but no moment accumulators (it was written by "
                f"a collect='all' run or a version without summary "
                f"checkpointing); an exact collect='summary' continuation "
                f"is impossible -- resume with collect='all' instead"
            )
        # pin the continuation to the original run's chunk size: the
        # remaining keep would otherwise re-balance to a different mc,
        # shifting the chunk boundaries (and their RNG splits) off the
        # uninterrupted run's
        cfg = cfg._replace(burn=rem_burn, keep=cfg.keep - kept_already,
                           mc_fixed=_mc)
        # cumulative progress handed to the drivers so THEIR checkpoints
        # carry run-chain totals (chained resumes stay exact).  The kept
        # base is the checkpoint's TRUE kept_done, not the cfg.keep-clipped
        # kept_already: a burn-extension resume asking for fewer keeps must
        # not shrink the counter and orphan already-sunk draws
        base_counts = ((counts[1], counts[2]) if counts is not None
                       else (resumed_it - kept_already * cfg.thin,
                             kept_already))
        if verbose:
            print(f"[resume] iteration {resumed_it}: {kept_already} kept "
                  f"draws already taken, {cfg.burn} burn + "
                  f"{cfg.keep} keep remaining")

    pre_burn_hook = None
    if tuner_join is not None:
        from spamtree_tpu.model.ram import ram_set_proposal

        def pre_burn_hook(st):
            # join point for the threaded curvature tuner: the drivers call
            # this after the sampling-scan compile is issued, so the tuner
            # wall time hides inside the compile wait
            t_j = time.time()
            sd = tuner_join()
            tb["tuner_join_wait_s"] = round(time.time() - t_j, 2)
            if verbose:
                d = np.sqrt(np.diag(sd))
                print(f"[tune] curvature proposal sd: "
                      f"{np.array2string(d, precision=4)}")
            return st._replace(ram=ram_set_proposal(st.ram, sd))

    try:
        t_ = time.time()
        if n_chains > 1:
            from spamtree_tpu.model.mcmc import (
                run_mcmc_chains,
                stack_chain_states,
            )

            # chains differ only in their RNG stream: build one state, then
            # broadcast + per-chain keys in a single compiled program
            states = state0 if state0 is not None else stack_chain_states(
                _mk_state(seed), seed + np.arange(n_chains)
            )
            tb["init_state_s"] = round(time.time() - t_, 2)
            res = run_mcmc_chains(ms, tspec.bounds, cfg, states,
                                  verbose=verbose,
                                  precompile=precompile,
                                  checkpoint_path=checkpoint_path,
                                  sink_dir=sink_dir,
                                  sink_append=resume_from is not None,
                                  const_model=settings["const_model"],
                                  mesh=mesh, pre_burn_hook=pre_burn_hook,
                                  init_moments=init_moments,
                                  base_counts=base_counts)
        else:
            state = state0 if state0 is not None else _mk_state(seed)
            tb["init_state_s"] = round(time.time() - t_, 2)
            res = run_mcmc(ms, tspec.bounds, cfg, state, verbose=verbose,
                           precompile=precompile,
                           checkpoint_path=checkpoint_path,
                           sink_dir=sink_dir,
                           sink_append=resume_from is not None,
                           const_model=settings["const_model"],
                           mesh=mesh, pre_burn_hook=pre_burn_hook,
                           init_moments=init_moments,
                           base_counts=base_counts)
    finally:
        if tuner_thread is not None:
            # never orphan the tuner thread: if anything above raised (or
            # the user interrupted) before the drivers reached the hook's
            # join point, wait it out (bounded) so it cannot race
            # interpreter teardown or keep burning CPU after the failure
            tuner_thread.join(timeout=60.0)
    tb["keep_compile_s"] = res.get("compile_time_s", 0.0)
    # sub-attribution of the compile span (trace/lower vs cache-load-or-
    # compile vs async delivery wait) -- only the *_s leaf keys above are
    # summed by bench.py's instrumented-total check, so nest these
    if res.get("compile_phases"):
        tb["keep_compile_phases"] = res["compile_phases"]
    if "init_wait_s" in res:
        # residual blocking on the async init program AFTER the compile --
        # the overlap's leftover (init_state_s above is dispatch only)
        tb["init_wait_s"] = res["init_wait_s"]

    out = {
        "coords": cs,
        "mv_id": mv_id[order],
        "order": order,  # maps sorted-row outputs back: original row order[i]
        "coordsinfo": {
            "coords": cs,
            "block": tree.block_of_row,
            "res": tree.res_of_row,
        },
        # single chain: w/yhat (keep, n); beta (p, keep, q); tausq (q, keep);
        # theta (n_theta, keep) -- matching the reference's return shapes.
        # n_chains > 1: a chain axis follows the sample axis (keep, C, ...).
        "w_mcmc": res["w"],
        "yhat_mcmc": res["yhat"],
        # keep=0 (e.g. a checkpoint-only burn run) leaves flat empties
        "beta_mcmc": (np.moveaxis(res["beta"], 0, 1)
                      if n_chains == 1 and res["beta"].ndim >= 2
                      else res["beta"]),
        "tausq_mcmc": res["tausq"].T if n_chains == 1 else res["tausq"],
        "theta_mcmc": res["theta"].T if n_chains == 1 else res["theta"],
        "n_chains": n_chains,
        "paramsd": res["paramsd"],
        "mcmc_time": res["mcmc_time"],
        "accept_ratio": res["accept_ratio"],
        "burn_actual": res.get("burn_actual", mcmc["burn"]),
        # resume bookkeeping (resume_from=): iteration the checkpoint held,
        # and how many of mcmc["keep"] draws the earlier run already took
        # (this run's sample arrays hold only the remaining keep draws)
        "resumed_at_iteration": resumed_it,
        "resumed_kept_already": kept_already,
        "setup_breakdown": tb,
        "flops_per_kept_sample": res.get("flops_per_kept_sample"),
        "bytes_per_kept_sample": res.get("bytes_per_kept_sample"),
        "block_ct_obs": tree.block_ct_obs,
        "tree": tree,
        "schedule": sched,
        "theta_bounds": tspec.bounds,
        # everything spamtree_predict needs to rebuild the same partition
        # and theta packing for post-fit prediction at new locations
        "fit_config": dict(
            cell_size=cell_size, K=K, start_level=start_level,
            tree_depth=tree_depth, last_not_reference=last_not_reference,
            limited_tree=limited_tree,
            cherrypick_same_margin=cherrypick_same_margin,
            cherrypick_group_locations=cherrypick_group_locations,
            mvbias=mvbias, seed=seed, dtype=dtype, mv_labels=uniq,
            btmlim=prior["btmlim"], toplim=prior["toplim"],
            vlim=prior["vlim"], set_unif_bounds=prior["set_unif_bounds"],
        ),
    }
    if settings["collect"] == "summary":
        # summary mode: device-accumulated posterior moments instead of the
        # full (keep, n) draw arrays (w_mcmc/yhat_mcmc hold the optional
        # summary_draws quantile subsample, else come back empty)
        for k in ("w_mean", "w_var", "yhat_mean", "yhat_var",
                  "summary_count"):
            out[k] = res[k]
    if n_chains > 1 and np.ndim(res["theta"]) == 3 \
            and res["theta"].shape[0] >= 4:
        # multi-chain convergence diagnostics on the (keep, C, n_theta)
        # draws (split-Rhat / bulk ESS; beyond the reference, which is
        # single-chain only)
        from spamtree_tpu.utils.summaries import ess, rhat

        out["theta_rhat"] = rhat(res["theta"])
        out["theta_ess"] = ess(res["theta"])
    return out


def spamtree_predict(
    fit,
    y,
    x,
    coords,
    coords_new,
    x_new,
    mv_id=None,
    mv_id_new=None,
    n_draws=None,
    seed=1,
    chunk=32,
    verbose=False,
):
    """Posterior-predictive draws at NEW locations after a fit, no refit.

    The reference can only predict at locations supplied as NA rows to the
    original call (prediction happens inside the MCMC loop,
    reference: src/spamtree_model.cpp:1229-1358); adding locations later
    means rerunning the whole chain.  This rebuilds the same partition over
    the augmented dataset -- the tree is a deterministic function of the
    OBSERVED rows only, so every observed block is unchanged and the new
    locations attach to the final prediction level by the same 1-NN rule
    (make_tree.R:317-413 semantics) -- then replays the fit's kept draws
    through the conditional-normal prediction operator
    (``predict_recompute``): for each kept (theta_s, w_s) the latent at the
    new locations is drawn from its exact treed-DAG conditional, and yhat
    adds X_new beta_s + observation noise.

    Parameters: ``fit`` is the dict returned by :func:`spamtree` (must be a
    draw-collecting run: ``collect="all"``); ``y, x, coords, mv_id`` are
    the ORIGINAL fit inputs (the tree is rebuilt from them);
    ``coords_new (m, dd)``, ``x_new (m, p)``, ``mv_id_new`` describe the
    new locations.  ``n_draws`` subsamples the kept draws evenly (default:
    all); ``chunk`` draws are processed per compiled call.

    Returns dict(w_pred (S, m), yhat_pred (S, m), draw_indices) in the
    original row order of ``coords_new``.
    """
    import jax

    from spamtree_tpu.model.core import ModelStatic, predict_recompute
    from spamtree_tpu.model.params import make_theta_spec
    from spamtree_tpu.tree.partition import make_tree
    from spamtree_tpu.tree.schedule import build_schedule

    fc = fit.get("fit_config")
    if fc is None:
        raise ValueError(
            "fit has no 'fit_config' (produced by an older version?); "
            "re-run spamtree() to use spamtree_predict"
        )
    w_draws = np.asarray(fit["w_mcmc"], dtype=np.float64)
    theta_draws = np.asarray(fit["theta_mcmc"], dtype=np.float64)
    if fit.get("n_chains", 1) > 1:
        # chains all target the posterior: fold the chain axis into draws
        w_draws = w_draws.reshape(-1, w_draws.shape[-1])
        theta_draws = theta_draws.reshape(-1, theta_draws.shape[-1])
        beta_draws = np.asarray(fit["beta_mcmc"], dtype=np.float64)
        beta_draws = beta_draws.reshape(-1, *beta_draws.shape[2:])
        tausq_draws = np.asarray(fit["tausq_mcmc"], dtype=np.float64)
        tausq_draws = tausq_draws.reshape(-1, tausq_draws.shape[-1])
    else:
        # single chain: theta (n_theta, keep), beta (p, keep, q),
        # tausq (q, keep) -- the reference's layouts
        theta_draws = theta_draws.T
        beta_draws = np.moveaxis(
            np.asarray(fit["beta_mcmc"], dtype=np.float64), 1, 0)
        tausq_draws = np.asarray(fit["tausq_mcmc"], dtype=np.float64).T
    S_all = w_draws.shape[0]
    if S_all == 0 or w_draws.shape[0] != theta_draws.shape[0]:
        raise ValueError(
            "fit holds no full w draws (collect='summary'?); "
            "spamtree_predict needs a draw-collecting fit"
        )

    # normalize the original inputs exactly like spamtree()
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    coords = np.asarray(coords, dtype=np.float64)
    n, dd = coords.shape
    if mv_id is None:
        mv_id = np.ones(n, dtype=np.int64)
    mv_id = np.asarray(mv_id, dtype=np.int64)
    if w_draws.shape[-1] != n:
        raise ValueError(
            f"fit draws cover {w_draws.shape[-1]} rows but y/coords have "
            f"{n}; pass the SAME data the fit used"
        )
    coords_new = np.asarray(coords_new, dtype=np.float64)
    if coords_new.ndim == 1:
        coords_new = coords_new[:, None]
    m = coords_new.shape[0]
    if coords_new.shape[1] != dd:
        raise ValueError(f"coords_new has {coords_new.shape[1]} columns, "
                         f"fit used {dd}")
    x_new = np.asarray(x_new, dtype=np.float64)
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    if x_new.shape != (m, x.shape[1]):
        raise ValueError(f"x_new must be ({m}, {x.shape[1]})")
    if mv_id_new is None:
        mv_id_new = np.ones(m, dtype=np.int64)
    mv_id_new = np.asarray(mv_id_new, dtype=np.int64)
    uniq = np.asarray(fc["mv_labels"])
    if not np.isin(mv_id_new, uniq).all():
        raise ValueError("mv_id_new contains labels the fit never saw")
    q = len(uniq)

    # augmented dataset: new rows are NA responses appended at the end
    y_aug = np.concatenate([y, np.full(m, np.nan)])
    x_aug = np.vstack([x, x_new])
    coords_aug = np.vstack([coords, coords_new])
    mv0_aug = np.searchsorted(uniq, np.concatenate([mv_id, mv_id_new]))
    n_aug = n + m

    order = np.lexsort(tuple(
        [np.arange(n_aug)] + [coords_aug[:, j] for j in range(dd - 1, -1, -1)]
    ))
    ys, xs, cs, mvs = (y_aug[order], x_aug[order], coords_aug[order],
                       mv0_aug[order])
    na_which = np.isfinite(ys)

    if np.isscalar(fc["cell_size"]):
        axis_size = int(round(fc["cell_size"] ** (1.0 / dd)))
    else:
        axis_size = np.asarray(fc["cell_size"])
    tree = make_tree(
        cs, na_which, mvs,
        axis_cell_size=axis_size, K=fc["K"], start_level=fc["start_level"],
        tree_depth=fc["tree_depth"],
        last_not_reference=fc["last_not_reference"],
        limited_tree=fc["limited_tree"],
        cherrypick_same_margin=fc["cherrypick_same_margin"],
        cherrypick_group_locations=fc["cherrypick_group_locations"],
        mvbias=fc["mvbias"], rng=np.random.default_rng(fc["seed"]),
        verbose=False,
    )
    # invariant: observed rows (which alone drive the partition) landed in
    # the same blocks as in the fit -- the fit's block ids over its sorted
    # observed rows must equal the augmented tree's, id-for-id
    fit_tree = fit.get("tree")
    if fit_tree is not None:
        obs_fit = np.isfinite(np.asarray(y)[fit["order"]])
        assert np.array_equal(
            tree.block_of_row[na_which],
            np.asarray(fit_tree.block_of_row)[obs_fit],
        ), "augmented partition diverged from the fit's on observed rows"
    sched = build_schedule(tree, limited_tree=fc["limited_tree"])
    tspec = make_theta_spec(
        dd, q,
        btmlim=fc["btmlim"] if fc["btmlim"] is not None else 1e-3,
        toplim=fc["toplim"] if fc["toplim"] is not None else 1e3,
        vlim=fc["vlim"], set_unif_bounds=fc["set_unif_bounds"],
    )
    ms = ModelStatic(sched, cs, mvs, ys, xs, tspec.spec, dtype=fc["dtype"])

    # fit's sorted-row w draws -> augmented sorted positions (old rows only;
    # every prediction row is redrawn inside predict_recompute anyway)
    inv_fit_order = np.empty(n, dtype=np.int64)
    inv_fit_order[fit["order"]] = np.arange(n)
    old_rows = order < n  # augmented-sorted rows that existed in the fit
    src = inv_fit_order[order[old_rows]]
    new_pos_sorted = np.flatnonzero(~old_rows)
    # report in the caller's coords_new order
    new_pos = new_pos_sorted[np.argsort(order[~old_rows] - n)]

    sel = (np.linspace(0, S_all - 1, int(n_draws)).round().astype(int)
           if n_draws is not None and n_draws < S_all
           else np.arange(S_all))
    S = len(sel)

    new_pos_dev = jnp.asarray(new_pos, dtype=jnp.int32)

    # ms passes as a pytree ARGUMENT (closed-over device arrays would be
    # inlined as O(n) program constants; see ModelStatic's pytree note)
    ms.materialize_device()
    @jax.jit
    def _chunk(ms_, thetas, ws, keys):
        def body(_, args):
            th, w0, k = args
            wf = predict_recompute(ms_, th, w0, k)
            return None, wf[new_pos_dev]
        return jax.lax.scan(body, None, (thetas, ws, keys))[1]

    root = jax.random.PRNGKey(seed)
    w_pred = np.empty((S, m), dtype=np.float64)
    dt = ms.dtype
    for lo in range(0, S, chunk):
        idx = sel[lo : lo + chunk]
        c = len(idx)
        pad = chunk - c
        wb = np.zeros((chunk, n_aug + 1), dtype=np.dtype(dt))
        wb[:c, : n_aug][:, old_rows] = w_draws[idx][:, src]
        th = np.zeros((chunk, theta_draws.shape[1]), dtype=np.dtype(dt))
        th[:c] = theta_draws[idx]
        if pad:
            th[c:] = theta_draws[idx[-1]]  # benign filler, discarded
        keys = jax.vmap(
            lambda i: jax.random.fold_in(root, i)
        )(jnp.arange(lo, lo + chunk))
        out = np.asarray(_chunk(ms, jnp.asarray(th), jnp.asarray(wb), keys))
        w_pred[lo : lo + c] = out[:c]
        if verbose:
            print(f"[predict] draws {lo + c}/{S}")

    # yhat = X_new beta_s (own margin) + w_new + tausq noise (host side,
    # mirrors the in-fit yhat assembly)
    rng = np.random.default_rng(seed)
    mvn0 = np.searchsorted(uniq, mv_id_new)
    xb = np.einsum("np,spq->snq", x_new, beta_draws[sel])[
        :, np.arange(m), mvn0]
    noise_sd = np.sqrt(tausq_draws[sel][:, mvn0])
    yhat_pred = xb + w_pred + noise_sd * rng.standard_normal((S, m))

    return {
        "w_pred": w_pred,
        "yhat_pred": yhat_pred,
        "draw_indices": sel,
    }
