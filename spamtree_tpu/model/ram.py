"""Robust Adaptive Metropolis (Vihola 2012) as a pure JAX state update.

Functional equivalent of ``RAMAdapt`` (reference: src/mh_adapt.h:40-135):
rank-1 update of the proposal Cholesky factor targeting acceptance 0.234,
with a g0-iteration warmup that accumulates an empirical proposal shape.
All state lives in a NamedTuple so it threads through ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_STAR = 0.234
GAMMA = 0.5 + 1e-6
G0 = 50  # warmup iterations (reference: mh_adapt.h:83)


class RAMState(NamedTuple):
    paramsd: jax.Array  # (p, p) lower-triangular proposal factor
    prodparam: jax.Array  # (p, p) warmup accumulator
    started: jax.Array  # bool
    propos_count: jax.Array
    accept_count: jax.Array


def ram_init(metropolis_sd: jax.Array) -> RAMState:
    """metropolis_sd is the initial proposal covariance S (reference: mh_adapt.h:84-87)."""
    paramsd = jnp.linalg.cholesky(metropolis_sd)
    return RAMState(
        paramsd=paramsd,
        prodparam=paramsd / (G0 + 1.0),
        started=jnp.array(False),
        propos_count=jnp.zeros(()),
        accept_count=jnp.zeros(()),
    )


def ram_set_proposal(ram: RAMState, cov) -> RAMState:
    """Replace the proposal covariance of a NOT-yet-started RAM state
    host-side (numpy Cholesky + device_put -- no device program, so no
    remote compile on the axon backend).  Used to patch a chain state that
    was built with a placeholder proposal while the curvature tuner ran
    concurrently with the sampling-scan compile (api.spamtree's lazy path).
    Broadcasts over any chain lead axes and preserves dtype/sharding of the
    existing leaves."""
    import numpy as np

    cov = np.asarray(cov, dtype=np.float64)
    if cov.ndim == 1:  # per-dimension variance vector
        cov = np.diag(cov)
    elif cov.ndim == 0:
        cov = np.eye(ram.paramsd.shape[-1]) * float(cov)
    pa = np.linalg.cholesky(cov).astype(ram.paramsd.dtype)
    pa = np.broadcast_to(pa, tuple(ram.paramsd.shape))
    put = lambda h, like: jax.device_put(h, like.sharding)
    return ram._replace(
        paramsd=put(pa, ram.paramsd),
        prodparam=put(pa / (G0 + 1.0), ram.prodparam),
    )


def ram_adapt(
    state: RAMState, U: jax.Array, alpha: jax.Array, mc: jax.Array,
    reference_warmup: bool = False,
) -> RAMState:
    """One adaptation step.

    Default (``reference_warmup=False``): plain Vihola (2012) -- rank-1
    coercion of the proposal factor from iteration 0, starting at the
    user-provided scale.

    ``reference_warmup=True`` reproduces the reference's variant
    (mh_adapt.h:117-135): for the first g0=50 iterations accumulate
    sum U U' / (mc+1) and *replace* the proposal factor with it at switch-on.
    Since U is standard normal this inflates the proposal to ~ harmonic(g0)
    * I regardless of the data -- kept only for parity experiments.
    """
    p = U.shape[0]

    def rank1(paramsd, i):
        eta = jnp.minimum(1.0, p * (i + 1.0) ** (-GAMMA))
        a = jnp.minimum(1.0, alpha)
        Sigma = jnp.eye(p, dtype=U.dtype) + eta * (a - ALPHA_STAR) * jnp.outer(
            U, U
        ) / jnp.sum(U * U)
        S = paramsd @ Sigma @ paramsd.T
        new_sd = jnp.linalg.cholesky(S)
        ok = jnp.all(jnp.isfinite(new_sd))
        return jnp.where(ok, new_sd, paramsd)

    if not reference_warmup:
        return state._replace(paramsd=rank1(state.paramsd, mc))

    def warmup(_):
        prod = state.prodparam + jnp.outer(U, U) / (mc + 1.0)
        return state._replace(prodparam=prod)

    def adapt(_):
        paramsd = jnp.where(state.started, state.paramsd, state.prodparam)
        new_sd = rank1(paramsd, mc - G0)
        return state._replace(paramsd=new_sd, started=jnp.array(True))

    return jax.lax.cond(mc < G0, warmup, adapt, None)
