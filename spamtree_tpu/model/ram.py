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


def ram_adapt(state: RAMState, U: jax.Array, alpha: jax.Array, mc: jax.Array) -> RAMState:
    """One adaptation step (reference: mh_adapt.h:117-135).

    ``U`` is the standard-normal proposal direction, ``alpha`` the (capped)
    acceptance probability, ``mc`` the 0-based iteration counter.
    """
    p = U.shape[0]

    def warmup(_):
        prod = state.prodparam + jnp.outer(U, U) / (mc + 1.0)
        return state._replace(prodparam=prod)

    def adapt(_):
        paramsd = jnp.where(state.started, state.paramsd, state.prodparam)
        i = mc - G0
        eta = jnp.minimum(1.0, p * (i + 1.0) ** (-GAMMA))
        a = jnp.minimum(1.0, alpha)
        Sigma = jnp.eye(p, dtype=U.dtype) + eta * (a - ALPHA_STAR) * jnp.outer(U, U) / jnp.sum(U * U)
        S = paramsd @ Sigma @ paramsd.T
        new_sd = jnp.linalg.cholesky(S)
        # keep the previous factor if the update went non-PD numerically
        ok = jnp.all(jnp.isfinite(new_sd))
        new_sd = jnp.where(ok, new_sd, paramsd)
        return state._replace(paramsd=new_sd, started=jnp.array(True))

    return jax.lax.cond(mc < G0, warmup, adapt, None)
