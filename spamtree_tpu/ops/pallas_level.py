"""Fused thin-level kernels (Pallas TPU): one kernel per tree level.

The per-level bisect (examples/bisect_levels.py, BENCH_RESULTS round 4)
showed the two deepest levels carry ~80% of both the decision sweep and
w-Gibbs, while the chip runs at ~1.4% of its HBM envelope: the cost is the
serialized chain of small XLA kernels per level (gather, einsum, reduce,
select, ...), each too small to fill the chip.  These kernels fuse a whole
thin (non-reference) level's math into ONE ``pallas_call``: every per-block
intermediate (the (P, S) conditional-mean operator M, residuals, precisions)
lives in VMEM only, the big HBM operands (the parent joint-factor batch, the
stored H operators) are streamed exactly once, and nothing but the scalar
decision quantities / the updated w and messages returns to HBM.

Replaces, on the TPU hot path, the thin-level bodies of
:func:`spamtree_tpu.model.core.sweep` (decision mode) and
:func:`spamtree_tpu.model.core.gibbs_w` (reference semantics:
get_loglik_comps_w_std / gibbs_sample_w_std at
src/spamtree_model.cpp:926-961, 1011-1226 -- the OpenMP block fan-out the
reference uses becomes the Pallas grid).

The parent joint factor is addressed through a scalar-prefetch index map
(``lp_pos``): parent-aligned levels stream it in order, unaligned levels get
per-program DMA of exactly the needed (P, P) slab -- either way at stream
bandwidth, never through an XLA gather (measured 97 GB/s vs 405 GB/s
streaming on this chip).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative VMEM gate: double-buffered (P, P) factor blocks dominate
MAX_P = 1024
MAX_S = 512


def _grid_batch(B: int, P: int, S: int, itemsize: int = 4) -> int:
    """Blocks per grid step.  One block per step is latency-bound (measured
    11.4 ms vs XLA's 6.5 ms for the n=1e5 decision sweep: ~7 us/step of
    fixed overhead + dependent-op latency across 1024 steps); batching G
    blocks amortizes the per-step cost and gives the scheduler independent
    MXU chains to overlap.  Bounded by double-buffered VMEM (~12 MB)."""
    per_block = (P * P + 2 * P * S + 8 * S) * itemsize
    G = max(1, int(6e6 // max(per_block, 1)))
    G = min(G, 16)
    while G > 1 and B % G:
        G -= 1
    return G


def use_level_kernels(dtype) -> bool:
    """Opt-in gate (``SPAMTREE_LEVEL_KERNELS=1``); default OFF.

    Measured negative result, now **negative even 128-aligned** (round 5,
    examples/ab_aligned.py, closing the round-4 alignment hypothesis): on
    128-aligned layouts (schedule joint_align=128 pads the leaf's parent
    joint 296 -> 384; the VPU kernel variant removes the misaligned
    augmented column) the fused decision-leaf kernel measures 11.1 ms vs
    9.3 ms unaligned vs XLA's 6.8 ms on the same (padded) layout and 5.6 ms
    on the production composed-parts path; thin_s_align=128 doubles
    everyone's work (S 68 -> 128).  The round-4 diagnosis -- unaligned
    block DMA as the floor -- is falsified; XLA's native-layout fusion
    pipeline simply beats per-block VMEM staging for this op mix.  Kept
    for A/B and future Mosaic revisions; tests force the gate on and run
    in interpreter mode on CPU."""
    env = os.environ.get("SPAMTREE_LEVEL_KERNELS")
    if env is not None:
        return env not in ("0", "false", "")
    return False


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _scalar_row(width, dt, **vals):
    """Pack named scalars into a (1, width) row (lane k = k-th value)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    row = jnp.zeros((1, width), dtype=dt)
    for k, v in enumerate(vals.values()):
        row = row + jnp.where(lane == k, v.astype(dt), 0.0)
    return row


def _thin_decision_kernel_vpu(kxc_ref, joint_ref, wpar_ref, wr_ref,
                              prevh_ref, prevprec_ref, kdiag_ref, rmask_ref,
                              out_ref, *, G: int):
    """Aligned-layout variant of the decision kernel: Kxc rides WITHOUT the
    augmented wpar column (so its trailing dim stays the 128-aligned S),
    and u = LAi wpar is a VPU broadcast-reduce over the VMEM-resident LAi
    instead of an MXU matvec.  Built for the 128-aligned layouts
    (schedule joint_align / thin_s_align) where every block DMA is then
    stride-free; parity-tested against the jnp thin branch."""
    dt = kxc_ref.dtype
    logdet = qn = qc = jnp.zeros((), dtype=dt)
    okf = jnp.ones((), dtype=dt)
    for g in range(G):
        Kxc = kxc_ref[g]          # (P, S)
        LAi = joint_ref[g].astype(dt)  # (P, P)
        wpar = wpar_ref[g]        # (1, P)
        w_r = wr_ref[g]           # (1, S)
        rmask = rmask_ref[g] > 0.5  # (1, S)

        M = jax.lax.dot_general(
            LAi, Kxc, (((1,), (0,)), ((), ())), preferred_element_type=dt
        )  # (P, S)
        # u_p = sum_q LAi[p, q] wpar[q]: VPU lane-reduce on the resident LAi
        u = jnp.sum(LAi * wpar, axis=1, keepdims=True)  # (P, 1)
        hk = jnp.sum(M * M, axis=0, keepdims=True)  # (1, S)
        hw = jnp.sum(M * u, axis=0, keepdims=True)  # (1, S)

        r = jnp.where(rmask, kdiag_ref[g] - hk, 1.0)
        okl = jnp.isfinite(r) & (r > 0)
        okf = jnp.minimum(okf, jnp.min(jnp.where(okl, 1.0, 0.0)))
        r = jnp.where(okl, r, 1.0)
        logdet = logdet - 0.5 * jnp.sum(jnp.where(rmask, jnp.log(r), 0.0))

        wx = w_r - hw
        qn = qn - 0.5 * jnp.sum(wx * wx / r)
        wxc = w_r - jnp.sum(prevh_ref[g] * wpar, axis=-1).reshape(1, -1)
        qc = qc - 0.5 * jnp.sum(prevprec_ref[g] * wxc * wxc)
    out_ref[0] = _scalar_row(8, dt, logdet=logdet, qn=qn, qc=qc, ok=okf)


def _thin_decision_kernel(kxc_ref, joint_ref, wpar_ref, wr_ref,
                          prevh_ref, prevprec_ref, kdiag_ref, rmask_ref,
                          out_ref, *, G: int):
    """G thin-level blocks of the decision sweep (core.sweep thin branch).

    Per block, entirely in VMEM:
      M    = LAi @ Kxc                      (P, S)
      hk   = sum_p M^2                      -> r = kdiag - hk
      hw   = M' (LAi wpar)                  prior conditional mean
      qn  += -0.5 (w_r - hw)^2 / r          new-theta quadratic form
      qc  += -0.5 prev_prec (w_r - prevH wpar)^2
      logdet += -0.5 sum log r   (masked), ok &= r finite & positive
    The G blocks are unrolled (independent MXU chains for the scheduler to
    overlap); one accumulated scalar row is written per grid step.
    """
    dt = kxc_ref.dtype
    logdet = qn = qc = jnp.zeros((), dtype=dt)
    okf = jnp.ones((), dtype=dt)
    for g in range(G):
        Kxc = kxc_ref[g]          # (P, S+1): [Kxc | wpar] augmented column
        LAi = joint_ref[g].astype(dt)  # (P, P)
        wpar = wpar_ref[g]        # (1, P)
        w_r = wr_ref[g]           # (1, S)
        rmask = rmask_ref[g] > 0.5  # (1, S)
        S = w_r.shape[-1]

        # ONE MXU op per block: a (1, P) @ (P, P) matvec costs the systolic
        # array as much as a full matmul (measured: 3 matvecs tripled the
        # kernel's cost), so u = LAi wpar rides as the augmented last column
        # of the RHS -- free, S already pads to the 128-lane tile -- and
        # every remaining contraction is a VPU broadcast-reduce.
        Maug = jax.lax.dot_general(
            LAi, Kxc, (((1,), (0,)), ((), ())), preferred_element_type=dt
        )  # (P, S+1) = [M | u]
        M = Maug[:, :S]
        u = Maug[:, S:]           # (P, 1)
        hk = jnp.sum(M * M, axis=0, keepdims=True)  # (1, S)
        # hw = M'u (core._hw_from_M without materializing H): VPU reduce
        hw = jnp.sum(M * u, axis=0, keepdims=True)  # (1, S)

        r = jnp.where(rmask, kdiag_ref[g] - hk, 1.0)
        okl = jnp.isfinite(r) & (r > 0)
        okf = jnp.minimum(okf, jnp.min(jnp.where(okl, 1.0, 0.0)))
        r = jnp.where(okl, r, 1.0)
        logdet = logdet - 0.5 * jnp.sum(jnp.where(rmask, jnp.log(r), 0.0))

        wx = w_r - hw
        qn = qn - 0.5 * jnp.sum(wx * wx / r)
        # wxc = w_r - prevH wpar: lane broadcast-reduce, no MXU
        wxc = w_r - jnp.sum(prevh_ref[g] * wpar, axis=-1).reshape(1, S)
        qc = qc - 0.5 * jnp.sum(prevprec_ref[g] * wxc * wxc)
    out_ref[0] = _scalar_row(8, dt, logdet=logdet, qn=qn, qc=qc, ok=okf)


@functools.partial(jax.jit, static_argnames=("aligned", "interpret"))
def thin_decision_level(Kxc, joint, lp_pos, wpar, w_r, prevH, prevprec,
                        kdiag, rmask_f, aligned: bool = False,
                        interpret: bool = False):
    """Fused decision-sweep body for one thin level.

    Args: Kxc (B,P,S) masked cross-covariance; joint (Bp,Pj,Pj) parent
    joint-factor batch (any storage dtype; Pj == P); lp_pos (B,) int32
    parent position per block; wpar (B,P); w_r (B,S); prevH (B,S,P);
    prevprec (B,S); kdiag (B,S); rmask_f (B,S) 0/1 floats.

    ``aligned=True`` (schedule._align_to_parent: lp_pos is the identity and
    Bp == B) streams the joint batch in grid order with G blocks per step
    (see _grid_batch); the general case runs one block per step with the
    parent slab addressed through a scalar-prefetch index map.

    Returns (logdet, ok, qn, qc) scalars, matching the jnp thin branch of
    ``core.sweep(decision_only=True)`` up to summation order.
    """
    B, P, S = Kxc.shape
    G = _grid_batch(B, P, S) if aligned else 1

    # vector operands ride as (B, 1, len): Mosaic requires the block's last
    # two dims be (8, 128)-divisible OR equal the array's trailing dims --
    # (1, len) blocks of a (B, len) array satisfy neither
    def v3(a):
        return a.reshape(a.shape[0], 1, a.shape[1])

    # 128-aligned layouts (schedule joint_align): no augmented column (it
    # would break Kxc's aligned trailing dim), u = LAi wpar on the VPU
    vpu = aligned and P % 128 == 0
    if vpu:
        kern = functools.partial(_thin_decision_kernel_vpu, G=G)
        args = (Kxc, joint, v3(wpar), v3(w_r), prevH, v3(prevprec),
                v3(kdiag), v3(rmask_f))
        Sk = S
    else:
        # wpar as the augmented last RHS column: u = LAi wpar rides the
        # block's single MXU matmul (see kernel docstring)
        Kaug = jnp.concatenate(
            [Kxc, wpar[:, :, None].astype(Kxc.dtype)], axis=2
        )
        kern = functools.partial(_thin_decision_kernel, G=G)
        args = (Kaug, joint, v3(wpar), v3(w_r), prevH, v3(prevprec),
                v3(kdiag), v3(rmask_f))
        Sk = S + 1
    if aligned:
        def spec3(d2, d3):
            return pl.BlockSpec((G, d2, d3), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kern,
            grid=(B // G,),
            in_specs=[
                spec3(P, Sk), spec3(P, P), spec3(1, P), spec3(1, S),
                spec3(S, P), spec3(1, S), spec3(1, S), spec3(1, S),
            ],
            out_specs=pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B // G, 1, 8), Kxc.dtype),
            interpret=interpret,
        )(*args)
    else:
        def spec3p(d2, d3):
            return pl.BlockSpec((1, d2, d3), lambda i, lp: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                spec3p(P, S + 1),
                pl.BlockSpec((1, P, P), lambda i, lp: (lp[i], 0, 0),
                             memory_space=pltpu.VMEM),
                spec3p(1, P), spec3p(1, S), spec3p(S, P),
                spec3p(1, S), spec3p(1, S), spec3p(1, S),
            ],
            out_specs=spec3p(1, 8),
        )
        out = pl.pallas_call(
            lambda lp_ref, *refs: kern(*refs),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, 1, 8), Kxc.dtype),
            interpret=interpret,
        )(lp_pos.astype(jnp.int32), *args)
    logdet = jnp.sum(out[:, 0, 0])
    qn = jnp.sum(out[:, 0, 1])
    qc = jnp.sum(out[:, 0, 2])
    ok = jnp.min(out[:, 0, 3]) > 0.5
    return logdet, ok, qn, qc


def _thin_gibbs_kernel(h_ref, prec_ref, wpar_ref, z_ref, ti_ref, resid_ref,
                       rmask_ref, wu_ref, msg_ref, *, G: int):
    """G thin-level blocks of the w-Gibbs update (core.gibbs_w thin branch).

    hw   = H wpar                 prior conditional mean
    sig  = prec + tausq_inv ; smu = prec*hw + resid
    wu   = smu/sig + z/sqrt(sig)  (masked to 0 off-block)
    msg  = H' (prec (wu - hw))    full parent message vector
    """
    for g in range(G):
        # column orientation (S, 1) throughout: both contractions against
        # the (S, P) operator H are VPU broadcast-reduces -- an MXU matvec
        # costs the systolic array as much as a full matmul
        H = h_ref[g]              # (S, P)
        prec = prec_ref[g]        # (S, 1)
        wpar = wpar_ref[g]        # (1, P)
        hw = jnp.sum(H * wpar, axis=-1, keepdims=True)   # (S, 1)
        sig = prec + ti_ref[g]
        smu = prec * hw + resid_ref[g]
        wu = smu / sig + z_ref[g] / jnp.sqrt(sig)
        wu = jnp.where(rmask_ref[g] > 0.5, wu, 0.0)
        v = prec * (wu - hw)      # (S, 1)
        msg = jnp.sum(H * v, axis=0, keepdims=True)      # (1, P)
        wu_ref[g] = wu
        msg_ref[g] = msg


@functools.partial(jax.jit, static_argnames=("interpret",))
def thin_gibbs_level(H, prec, wpar, z, ti, resid, rmask_f,
                     interpret: bool = False):
    """Fused w-Gibbs body for one thin level: (wu, msg_full).

    Args: H (B,S,P) stored conditional-mean operators; prec (B,S) stored
    precisions; wpar (B,P); z (B,S) standard normals; ti (B,S) per-row noise
    precision; resid (B,S) = ti*(y - XB); rmask_f (B,S) 0/1.

    Returns wu (B,S) posterior draws and msg (B,P) = H' prec (wu - H wpar),
    matching ``core.gibbs_w``'s thin branch (the per-segment Gram additions
    and parent routing stay outside -- they are cross-block GEMMs).
    """
    B, S, P = H.shape
    G = _grid_batch(B, P, S)

    def col(a):  # (B, S) -> (B, S, 1) column orientation (see kernel)
        return a.reshape(a.shape[0], a.shape[1], 1)

    def spec3(d2, d3):
        return pl.BlockSpec((G, d2, d3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    wu, msg = pl.pallas_call(
        functools.partial(_thin_gibbs_kernel, G=G),
        grid=(B // G,),
        in_specs=[
            spec3(S, P),
            spec3(S, 1), spec3(1, P),
            spec3(S, 1), spec3(S, 1), spec3(S, 1), spec3(S, 1),
        ],
        out_specs=(spec3(S, 1), spec3(1, P)),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, 1), H.dtype),
            jax.ShapeDtypeStruct((B, 1, P), H.dtype),
        ),
        interpret=interpret,
    )(H, col(prec), wpar.reshape(B, 1, P), col(z), col(ti), col(resid),
      col(rmask_f))
    return wu[:, :, 0], msg[:, 0]
