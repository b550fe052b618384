"""Per-phase timing diagnostics.

The reference hand-times every sampler phase with steady_clock spans printed
under ``verbose`` (reference: spamtree_fit.cpp:182-330, spamtree_model.cpp
timer blocks).  Under jit those phases fuse, so this module provides an
out-of-band profiler: it runs each phase as its own jitted function with
``block_until_ready`` fences and reports milliseconds per phase, plus a
handle to the JAX trace profiler for deep dives.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from spamtree_tpu.model.core import (
    ModelStatic,
    gibbs_beta,
    gibbs_tausq,
    gibbs_w,
    predict,
    quad_loglik,
    sweep,
)


def time_phases(ms: ModelStatic, state, iters: int = 20) -> dict:
    """Time each MCMC phase separately (compile excluded). Returns ms/phase."""
    ms.materialize_device()  # every phase fn below takes ms as a jit argument
    key = jax.random.PRNGKey(0)
    Vi = 0.01 * jnp.eye(ms.p, dtype=ms.dtype)
    Vim = jnp.zeros((ms.p,), dtype=ms.dtype)

    f_sweep = jax.jit(lambda m, th, w: sweep(m, th, w))
    f_sweep_fused = jax.jit(lambda m, th, w, ld: sweep(m, th, w, quad_prev=ld))
    f_quad = jax.jit(lambda m, ld, w: quad_loglik(m, ld, w))
    f_gw = jax.jit(lambda m, ld, w, ti, xb, k: gibbs_w(m, ld, w, ti, xb, k))
    f_pred = jax.jit(lambda m, pd_, w, k: predict(m, pd_, w, k))
    f_tau = jax.jit(lambda m, w, xb, k: gibbs_tausq(m, w, xb, k, (2.01, 1.0)))
    f_beta = jax.jit(lambda m, w, ti, k: gibbs_beta(m, w, ti, k, Vi, Vim))

    ld, pd, logdet, ok = f_sweep(ms, state.theta, state.w)
    phases = {
        "sweep(theta-loglik)": lambda: f_sweep(ms, state.theta, state.w),
        "sweep_fused(+quad x2)": lambda: f_sweep_fused(ms, state.theta, state.w, ld),
        "quad_loglik": lambda: f_quad(ms, ld, state.w),
        "gibbs_w": lambda: f_gw(ms, ld, state.w, state.tausq_inv, state.XB, key),
        "predict": lambda: f_pred(ms, pd, state.w, key),
        "gibbs_tausq": lambda: f_tau(ms, state.w, state.XB, key),
        "gibbs_beta": lambda: f_beta(ms, state.w, state.tausq_inv, key),
    }
    out = {}
    for name, fn in phases.items():
        jax.block_until_ready(fn())  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        out[name] = (time.perf_counter() - t0) / iters * 1e3
    # the production step runs the fused sweep (both MH quadratic forms ride
    # the proposal sweep); standalone sweep/quad rows are for comparison
    out["total_per_iter"] = (
        out["sweep_fused(+quad x2)"] + out["gibbs_w"]
        + out["gibbs_tausq"] + out["gibbs_beta"]
    )
    return out


def trace_profile(fn, args, logdir: str = "/tmp/spamtree-trace"):
    """Capture a JAX profiler trace of one call (view with xprof/tensorboard)."""
    with jax.profiler.trace(logdir):
        out = fn(*args)
        jax.block_until_ready(out)
    return logdir
