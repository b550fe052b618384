"""Checkpoint / resume for SpamTree MCMC chains.

The reference has no checkpointing (SURVEY.md §5: warm starts only, with the
adapted proposal covariance returned for manual chaining).  Here the full
sampler state -- latent w, beta, tausq, theta, RAM adapter state, RNG key and
iteration counter -- round-trips through a single .npz file.  The per-level
factor data (LevelData) is NOT stored: it is a pure function of theta and is
rebuilt with one likelihood sweep on load.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spamtree_tpu.model.core import ModelStatic, gram_full, sweep
from spamtree_tpu.model.mcmc import MCMCState
from spamtree_tpu.model.ram import RAMState


def save_state(path: str, state: MCMCState, moments=None,
               counts=None) -> None:
    """``moments`` (optional, summary-collection runs): the running
    posterior-moment accumulators (mcmc.Moments) saved alongside the chain
    state, so an interrupted ``collect="summary"`` run resumes its exact
    partial sums instead of silently restarting them at zero (the drawn
    samples they summarize are not retrievable any other way).

    ``counts`` (optional): the writing run's chunk geometry and cumulative
    progress ``(mc, burn_done, kept_done, thin)``.  The resume path needs
    the WRITING run's numbers, not an inference from the resume call's
    config: the balanced chunk size depends on ``keep``, so a resume asking
    for a different keep would otherwise decompose the iteration counter
    with the wrong burn_actual and silently mis-count the draws already
    taken (api.spamtree falls back to that inference only for checkpoints
    written before this field existed).  ``thin`` is stored so the resume
    path can REJECT a continuation under a different thin: iterations per
    chunk are mc*thin, so a thin change silently shifts burn_actual and the
    chunk/RNG boundaries, contradicting the exact-continuation guarantee."""
    extra = {}
    if counts is not None:
        extra["geom_counts"] = np.asarray(counts, dtype=np.int64)
    if moments is not None:
        extra.update(
            mom_count=np.asarray(moments.count),
            mom_w_sum=np.asarray(moments.w_sum),
            mom_w_sq=np.asarray(moments.w_sq),
            mom_yh_sum=np.asarray(moments.yh_sum),
            mom_yh_sq=np.asarray(moments.yh_sq),
        )
    np.savez(
        path,
        **extra,
        key=np.asarray(state.key),
        w=np.asarray(state.w),
        beta=np.asarray(state.beta),
        tausq_inv=np.asarray(state.tausq_inv),
        XB=np.asarray(state.XB),
        theta=np.asarray(state.theta),
        logdetCi=np.asarray(state.logdetCi),
        it=np.asarray(state.it),
        ram_paramsd=np.asarray(state.ram.paramsd),
        ram_prodparam=np.asarray(state.ram.prodparam),
        ram_started=np.asarray(state.ram.started),
        ram_propos=np.asarray(state.ram.propos_count),
        ram_accept=np.asarray(state.ram.accept_count),
    )


def load_counts(path: str):
    """(mc, burn_done, kept_done[, thin]) of the run that wrote the
    checkpoint (3-tuple for checkpoints from before thin was recorded), or
    None for checkpoints from before the field existed."""
    with np.load(path) as z:
        if "geom_counts" not in z.files:
            return None
        return tuple(int(v) for v in z["geom_counts"])


def load_moments(path: str, ms: ModelStatic):
    """Load the summary-mode moment accumulators saved by ``save_state``
    (None when the checkpoint was not a summary-collection run)."""
    from spamtree_tpu.model.mcmc import Moments

    with np.load(path) as z:
        if "mom_count" not in z.files:
            return None
        dt = ms.dtype
        return Moments(
            count=jnp.asarray(z["mom_count"], dtype=dt),
            w_sum=jnp.asarray(z["mom_w_sum"], dtype=dt),
            w_sq=jnp.asarray(z["mom_w_sq"], dtype=dt),
            yh_sum=jnp.asarray(z["mom_yh_sum"], dtype=dt),
            yh_sq=jnp.asarray(z["mom_yh_sq"], dtype=dt),
        )


def load_state(path: str, ms: ModelStatic) -> MCMCState:
    """Load a single-chain or stacked multi-chain (leading C axis) state."""
    ms.materialize_device()  # sweep_fn below takes ms as a jit argument
    with np.load(path) as zf:  # close the npz handle promptly
        z = {k: zf[k] for k in zf.files}
    dt = ms.dtype
    theta = jnp.asarray(z["theta"], dtype=dt)
    w = jnp.asarray(z["w"], dtype=dt)
    stacked = theta.ndim == 2

    def sweep_fn(m, t, ww):
        if stacked:
            # chains carry no gram (see mcmc.stack_chain_states)
            return jax.vmap(lambda tt, www: sweep(m, tt, www))(t, ww) + ((),)
        ld, pd, lg, okk = sweep(m, t, ww)
        return ld, pd, lg, okk, gram_full(m, ld)

    from spamtree_tpu.utils.execcache import cached_compile

    # the rebuild sweep rides the serialized-executable cache: a resumed
    # run in a fresh process would otherwise pay a full remote compile
    rebuild = cached_compile(jax.jit(sweep_fn).lower(ms, theta, w))
    leveldata, pred_data, logdet, ok, gram = rebuild(ms, theta, w)
    if not bool(jnp.all(ok)):
        raise RuntimeError("checkpointed theta fails Cholesky on rebuild")
    ram = RAMState(
        paramsd=jnp.asarray(z["ram_paramsd"], dtype=dt),
        prodparam=jnp.asarray(z["ram_prodparam"], dtype=dt),
        started=jnp.asarray(z["ram_started"]),
        propos_count=jnp.asarray(z["ram_propos"], dtype=dt),
        accept_count=jnp.asarray(z["ram_accept"], dtype=dt),
    )
    return MCMCState(
        key=jnp.asarray(z["key"], dtype=jnp.uint32),
        w=w,
        beta=jnp.asarray(z["beta"], dtype=dt),
        tausq_inv=jnp.asarray(z["tausq_inv"], dtype=dt),
        XB=jnp.asarray(z["XB"], dtype=dt),
        theta=theta,
        leveldata=leveldata,
        pred_data=pred_data,
        logdetCi=logdet,
        ram=ram,
        it=jnp.asarray(z["it"], dtype=jnp.int32),
        gram=gram,
    )
