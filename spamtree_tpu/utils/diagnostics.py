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
    key = jax.random.PRNGKey(0)
    Vi = 0.01 * jnp.eye(ms.p, dtype=ms.dtype)
    Vim = jnp.zeros((ms.p,), dtype=ms.dtype)

    f_sweep = jax.jit(lambda th, w: sweep(ms, th, w))
    f_quad = jax.jit(lambda ld, w: quad_loglik(ms, ld, w))
    f_gw = jax.jit(lambda ld, w, ti, xb, k: gibbs_w(ms, ld, w, ti, xb, k))
    f_pred = jax.jit(lambda pd_, w, k: predict(ms, pd_, w, k))
    f_tau = jax.jit(lambda w, xb, k: gibbs_tausq(ms, w, xb, k, (2.01, 1.0)))
    f_beta = jax.jit(lambda w, ti, k: gibbs_beta(ms, w, ti, k, Vi, Vim))

    ld, pd, logdet, ok = f_sweep(state.theta, state.w)
    phases = {
        "sweep(theta-loglik)": lambda: f_sweep(state.theta, state.w),
        "quad_loglik": lambda: f_quad(ld, state.w),
        "gibbs_w": lambda: f_gw(ld, state.w, state.tausq_inv, state.XB, key),
        "predict": lambda: f_pred(pd, state.w, key),
        "gibbs_tausq": lambda: f_tau(state.w, state.XB, key),
        "gibbs_beta": lambda: f_beta(state.w, state.tausq_inv, key),
    }
    out = {}
    for name, fn in phases.items():
        jax.block_until_ready(fn())  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        out[name] = (time.perf_counter() - t0) / iters * 1e3
    out["total_per_iter"] = sum(
        v for k, v in out.items() if k != "predict"
    ) + out["predict"] * 0  # predict only on kept iters
    return out


def trace_profile(fn, args, logdir: str = "/tmp/spamtree-trace"):
    """Capture a JAX profiler trace of one call (view with xprof/tensorboard)."""
    with jax.profiler.trace(logdir):
        out = fn(*args)
        jax.block_until_ready(out)
    return logdir
