"""SpamTree model core: batched level-synchronous sweeps in pure JAX.

TPU-native equivalent of class ``SpamTreeMV`` (reference:
src/spamtree_model.h:22-212, src/spamtree_model.cpp).  Where the reference
loops OpenMP threads over blocks within a tree level, here every level is one
dense batched computation over padded block arrays (see
``spamtree_tpu.tree.schedule``), and the level loop is unrolled inside jit:

* likelihood sweep  -> ``sweep``        (reference: get_loglik_comps_w_std,
                                         spamtree_model.cpp:834-998)
* cheap re-loglik   -> ``quad_loglik``  (get_loglik_w_std, .cpp:781-826)
* latent w Gibbs    -> ``gibbs_w``      (gibbs_sample_w_std, .cpp:1011-1226)
* prediction        -> ``predict``      (predict_std, .cpp:1234-1358)
* beta Gibbs        -> ``gibbs_beta``   (gibbs_sample_beta, .cpp:1364-1391)
* tausq Gibbs       -> ``gibbs_tausq``  (gibbs_sample_tausq, .cpp:1393-1417)

Cholesky failure never raises: validity flags are carried and a failed
theta-proposal sweep auto-rejects, mirroring the reference's try/catch ->
``errtype`` -> reject flow (.cpp:875-877, 971-982).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from spamtree_tpu.ops.covariance import (
    CovModel,
    pairwise_cov,
    pairwise_cov_diag,
    unpack_theta,
)
from spamtree_tpu.ops import pallas_level
from spamtree_tpu.ops.linalg import (
    chol_inv_masked,
    chol_masked,
    identity_pad,
    tri_inv,
    tri_solve,
)
from spamtree_tpu.tree.schedule import Schedule


class LevelArrays(NamedTuple):
    """Static per-level device arrays (int32 indices, bool masks)."""

    rows: jax.Array  # (B, S) sentinel n
    prows: jax.Array  # (B, P) sentinel n
    rmask: jax.Array  # (B, S)
    pmask: jax.Array  # (B, P)
    lp_pos: jax.Array  # (B,)
    anc_blocks: jax.Array  # (B, n_anc) ancestor block ids, sentinel n_blocks
    block_ids: jax.Array  # (B,)


class LevelData(NamedTuple):
    """Per-level theta-dependent state (the param_data analog,
    reference: src/tree_utils.h:63-102)."""

    H: jax.Array  # (B, S, P) conditional mean operator w_cond_mean_K
    prec: jax.Array  # (B, S, S) ref levels / (B, S) thin levels


class ModelStatic:
    """All static data + schedule, ready for the jitted samplers."""

    def __init__(
        self,
        sched: Schedule,
        coords: np.ndarray,
        mv_id: np.ndarray,
        y: np.ndarray,
        X: np.ndarray,
        spec: CovModel,
        dtype=jnp.float32,
        block_multiple: int = 1,
        chunk_bytes: float = 512e6,
        use_pallas: bool | None = None,
        factor_dtype=None,
    ):
        n = sched.n
        self.sched = sched  # host-side only; excluded from the jit pytree
        self.limited_tree = sched.limited_tree
        self.spec = spec
        self.dtype = dtype
        # storage dtype for the propagated joint inverse-Cholesky factors J
        # (the largest in-sweep transients, (B, P, P) at deep levels).  They
        # are only ever READ through the child-apply GEMMs in
        # _apply_parent_factor -- never through the MH quadratic forms, where
        # bf16's 2^-8 relative error would corrupt logaccept at |q| ~ n/2 --
        # so "bfloat16" halves their HBM write+read traffic while all math
        # (Schur complement, Cholesky, accumulation) stays at model dtype.
        # None (default) stores J at model dtype.
        self.factor_dtype = None if factor_dtype is None else jnp.dtype(factor_dtype)
        if use_pallas is None:
            from spamtree_tpu.ops.pallas_chol import use_pallas_chol

            use_pallas = use_pallas_chol(64) and dtype == jnp.float32
        self.use_pallas = use_pallas
        self.n = n
        self.p = X.shape[1]
        self.q = spec.q

        obs = np.isfinite(np.asarray(y, dtype=np.float64))
        y0 = np.where(obs, y, 0.0)
        # cast in NumPy, put already-typed buffers: jnp.asarray(host, dtype=)
        # with a dtype CHANGE dispatches a separately-compiled
        # convert_element_type program per distinct shape (~0.4 s each
        # through the remote compiler); a dtype-matched put compiles nothing
        ndt = np.dtype(dtype)

        # the global row-indexed arrays go straight to device (dtype-matched
        # puts compile nothing): the chunked level paths index them with
        # traced slab indices, which numpy constants cannot support.  The
        # far larger derived leaves (levels/assign/anc_pos) are staged
        # host-side below and only materialized on demand.
        def _put(a, dt=ndt):
            return jnp.asarray(np.asarray(a, dtype=dt))

        self.coords = _put(np.vstack([coords, np.zeros((1, coords.shape[1]))]))
        self.mv = _put(np.append(mv_id, 0), np.int32)
        self.y = _put(np.append(y0, 0.0))
        self.X = _put(X)
        self.obs_mask = _put(obs)  # (n,)
        self.mv_onehot_obs = _put(
            (mv_id[:, None] == np.arange(spec.q)[None, :]) & obs[:, None]
        )  # (n, q)
        self.mv_onehot = _put(mv_id[:, None] == np.arange(spec.q)[None, :])
        self.n_obs_by_q = np.asarray(
            [(obs & (mv_id == j)).sum() for j in range(spec.q)], dtype=np.float64
        )
        # X'X on observed rows per margin (reference: spamtree_model.cpp:151-155)
        XtX = np.stack(
            [
                (np.asarray(X)[obs & (mv_id == j)].T @ np.asarray(X)[obs & (mv_id == j)])
                for j in range(spec.q)
            ]
        )
        self.XtX = _put(XtX)

        # B-axis chunking: bound peak HBM of the per-level transients (the
        # (B, P, P) propagated-factor gather dominates at deep levels).  A
        # level whose big transient would exceed chunk_bytes is processed in
        # n_chunks sequential slabs; B is padded to a multiple of n_chunks.
        itemsize = ndt.itemsize

        def _n_chunks(plan, factor=1) -> int:
            B, P = plan.rows.shape[0], plan.prows.shape[1]
            big = factor * B * max(P * P, 1) * itemsize
            if not chunk_bytes or big <= chunk_bytes:
                return 1
            return int(np.ceil(big / chunk_bytes))

        pred_buckets = sched.pred_buckets or []

        def _n_chunks_aligned(plan) -> int:
            # aligned levels never materialize the (B, P, P) gather -- the
            # factor batch is read in place -- so the peak transient is the
            # (B, P, S)-class tensors (Kxc, M, H)
            B, S, P = plan.rows.shape[0], plan.rows.shape[1], plan.prows.shape[1]
            big = 3 * B * P * max(S, 1) * itemsize
            if not chunk_bytes or big <= chunk_bytes:
                return 1
            return int(np.ceil(big / chunk_bytes))

        # parent-aligned thin/pred levels (schedule._align_to_parent) read
        # the parent joint-factor batch directly instead of gathering rows,
        # which requires the child's padded B to EQUAL the parent's padded B
        # and the level to run unchunked; otherwise demote to the gather
        # path (their lp_pos is the identity, so gathering stays correct)
        padded_B: list = []
        self.level_chunks = []
        self.level_aligned = []
        for t, p in enumerate(sched.levels):
            gc = getattr(p, "group_c", 1)
            B = p.rows.shape[0]
            al = bool(getattr(p, "aligned", False))
            nc = (_n_chunks_aligned(p) if al else _n_chunks(p))
            al = al and nc == 1
            if not al:
                nc = _n_chunks(p)
            mult = block_multiple * nc * gc
            tgt = padded_B[p.lp_level] if al else None
            if al and (tgt < B or tgt % mult != 0):
                al, tgt = False, None
                nc = _n_chunks(p)
                mult = block_multiple * nc * gc
            self.level_chunks.append(nc)
            self.level_aligned.append(al)
            padded_B.append(tgt if tgt is not None else B + (-B) % mult)
        self.pred_chunks = []
        self.pred_aligned = []
        pred_pad_to = []
        for p in pred_buckets:
            B = p.rows.shape[0]
            al = bool(getattr(p, "aligned", False))
            nc = (_n_chunks_aligned(p) if al else _n_chunks(p, 2))
            al = al and nc == 1
            if not al:
                nc = _n_chunks(p, 2)
            mult = block_multiple * nc
            tgt = padded_B[p.lp_level] if al else None
            if al and (tgt < B or tgt % mult != 0):
                al, tgt = False, None
                nc = _n_chunks(p, 2)
            self.pred_chunks.append(nc)
            self.pred_aligned.append(al)
            pred_pad_to.append(tgt)

        # one bulk int32 transfer for all index arrays: the device link has
        # high per-transfer overhead, so ~30 individual puts of up to 50MB
        # each dominated setup at n ~ 1e6 (9 minutes); a single packed buffer
        # + device-side slicing takes seconds.  Boolean masks are derived on
        # device from the sentinel convention (row index == n).
        _pack_bufs: list = []
        _pack_meta: list = []

        def _stage(a):
            _pack_meta.append(a.shape)
            _pack_bufs.append(np.ascontiguousarray(a, dtype=np.int32).ravel())
            return len(_pack_bufs) - 1

        def _conv_stage(plan, n_chunks=1, pad_to=None):
            B = plan.rows.shape[0]
            gc = getattr(plan, "group_c", 1)
            # padding must keep parent-major groups whole per shard and per
            # sequential slab (lp_pos[::gc] indexing relies on alignment);
            # pad_to forces a parent-aligned level to the parent's padded B
            mult = block_multiple * n_chunks * gc
            pad = (-B) % mult if pad_to is None else pad_to - B
            # whole dummy blocks for even sharding/chunking
            nb = sched.n_blocks

            def _padB(a, fill):
                if pad == 0:
                    return a
                ext = np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)
                return np.concatenate([a, ext], axis=0)

            return dict(
                rows=_stage(_padB(plan.rows, n)),
                prows=_stage(_padB(plan.prows, n)),
                lp_pos=_stage(_padB(plan.lp_pos, 0)),
                anc_blocks=_stage(_padB(plan.anc_blocks, nb)),
                block_ids=_stage(_padB(plan.block_ids, nb)),
            )

        staged = [
            _conv_stage(p, nc, padded_B[t])
            for t, (p, nc) in enumerate(zip(sched.levels, self.level_chunks))
        ]
        staged_pred = [
            _conv_stage(p, nc, pt)
            for p, nc, pt in zip(pred_buckets, self.pred_chunks, pred_pad_to)
        ]

        # padded batch size of a staged level, from host metadata (the device
        # arrays are not materialized until the single unpack program below)
        def _staged_B(stagedict) -> int:
            return _pack_meta[stagedict["rows"]][0]

        self.level_is_ref = [p.is_ref for p in sched.levels]
        self.level_group_c = [getattr(p, "group_c", 1) for p in sched.levels]
        self.level_lp = [p.lp_level for p in sched.levels]
        self.level_segs = [(p.seg_off, p.seg_size) for p in sched.levels]
        # which sweep levels must emit a joint factor (used by a later level),
        # and the last level that consumes each factor (for HBM liveness:
        # joint factors at deep levels are the largest transients in the
        # sweep, so they are dropped as soon as their last consumer ran)
        used = {p.lp_level for p in sched.levels if p.lp_level >= 0}
        # parents of SWEEP levels only (no prediction): the decision-only
        # sweep never builds prediction operators, so a level whose joint
        # factor feeds only the prediction buckets skips emitting it there
        self.serves_as_sweep_parent = [
            t in used for t in range(len(sched.levels))
        ]
        self.pred_lp = pred_buckets[0].lp_level if pred_buckets else -1
        if self.pred_lp >= 0:
            used.add(self.pred_lp)
        # identity-pad width of each ref level's emitted joint factor: >0 only
        # when the schedule 128-aligned the deepest joint layout
        # (schedule.build_schedule joint_align); consumers' prows are then
        # wider than [prows ; rows] and _assemble_joint appends identity rows
        self.joint_pad = [0] * len(sched.levels)
        for t2, p2 in enumerate(sched.levels):
            if not p2.is_ref:
                continue
            w_emit = p2.prows.shape[1] + p2.rows.shape[1]
            widths = {
                sched.levels[c].prows.shape[1]
                for c in range(len(sched.levels))
                if sched.levels[c].lp_level == t2 and c != t2
                and sched.levels[c].prows.shape[1] > 0
            }
            if self.pred_lp == t2:
                widths |= {p.prows.shape[1] for p in pred_buckets}
            if widths and not sched.limited_tree:
                assert len(widths) == 1, (t2, widths)
                wc = widths.pop()
                assert wc >= w_emit, (t2, wc, w_emit)
                self.joint_pad[t2] = wc - w_emit
        self.serves_as_parent = [t in used for t in range(len(sched.levels))]
        self.last_consumer = {}
        for t2, p in enumerate(sched.levels):
            if p.lp_level >= 0:
                self.last_consumer[p.lp_level] = t2
        if self.pred_lp >= 0:
            # the prediction operators are built after the level loop
            self.last_consumer[self.pred_lp] = len(sched.levels)
        # carry the prediction operators only while they are small enough;
        # above the threshold they are recomputed per kept iteration
        if pred_buckets:
            pH = sum(
                p.rows.shape[0] * p.rows.shape[1] * p.prows.shape[1]
                for p in pred_buckets
            ) * itemsize
            self.pred_in_carry = pH <= 256e6
        else:
            self.pred_in_carry = True

        # Gibbs-message routing as dense 0/1 assignment matrices: segment a of
        # child level t' targets parent level `seg_level[t'][a]`; the
        # child->parent sum becomes one GEMM per (t', a) pair instead of a
        # scatter-add (TPU scatters measured 25x slower than the equivalent
        # matmul).  Assign[(t', a)][p, c] = 1 iff child c's a-th ancestor is
        # parent block p.
        level_of_block = np.full(sched.n_blocks + 1, -1, dtype=np.int64)
        for t, p in enumerate(sched.levels):
            level_of_block[np.asarray(p.block_ids)] = t
        self.seg_level = []  # per level: parent sweep-level of each segment
        self.assign = {}  # (t_child, a) -> (B_parent, B_child) 0/1 matrix
        self.anc_pos = {}  # (t_child, a) -> parent position in its level batch
        assign_bytes = 64e6  # above this, route via position-scatter instead
        _assign_np = {}  # staged host-side, shipped in one packed transfer
        _ancpos_idx = {}  # (t, a) -> staged-buffer index of the position vec
        for t in range(len(sched.levels)):
            plan = sched.levels[t]
            segs = []
            # padded child anc batch from the HOST staging buffers: pulling
            # the device copy back through the ~20 MB/s relay both wasted
            # setup time and (observed once at n=1e6) hit a worker crash
            idx = staged[t]["anc_blocks"]
            anc = _pack_bufs[idx].reshape(_pack_meta[idx])
            for a in range(len(plan.seg_off)):
                anc_a = anc[:, a]
                real = anc_a[anc_a < sched.n_blocks]
                tp_set = set(np.unique(level_of_block[real]).tolist())
                assert len(tp_set) == 1, f"segment {a} of level {t}: {tp_set}"
                tp = tp_set.pop()
                segs.append(tp)
                par_ids = np.asarray(sched.levels[tp].block_ids)
                Bc = anc_a.shape[0]
                Bp = _staged_B(staged[tp])
                # vectorized block-id -> position-in-level lookup; dummy
                # group-padding blocks (id == n_blocks) must not claim the
                # sentinel slot, which routes masked children to "dropped"
                pos_table = np.full(sched.n_blocks + 1, Bp, dtype=np.int64)
                real_par = par_ids < sched.n_blocks
                pos_table[par_ids[real_par]] = np.arange(len(par_ids))[real_par]
                pvec = pos_table[np.minimum(anc_a, sched.n_blocks)]
                if Bp * Bc * 4 <= assign_bytes:
                    A = np.zeros((Bp + 1, Bc), dtype=np.float32)
                    A[pvec, np.arange(Bc)] = 1.0
                    _assign_np[(t, a)] = A[:Bp]
                else:
                    _ancpos_idx[(t, a)] = _stage(pvec)
            self.seg_level.append(segs)

        # Stage EVERY model leaf (index arrays, masks, assignment matrices,
        # scatter position vectors) HOST-SIDE as numpy views into two packed
        # buffers.  Device materialization is deferred to materialize_device:
        # const-model runs (the samplers close over ms) never need it -- the
        # leaves trace as literal constants -- which removes the
        # materializer's remote compile (~10-60 s cold) from their setup
        # entirely.  Argument-mode and sharded runs materialize through
        # exactly one host->device transfer per packed buffer and ONE jitted
        # unpack program; building leaf-by-leaf with eager slice/reshape/
        # compare ops would dispatch ~96 separately-compiled mini-programs at
        # ~0.4 s each through the remote compiler (the whole of the 42 s
        # round-2 "staging" cost at n=1e5 was those compiles, not the 17 MB
        # of actual data).
        packed_np = np.concatenate(_pack_bufs)
        offs = np.cumsum([0] + [b.size for b in _pack_bufs])
        akeys = sorted(_assign_np)
        if akeys:
            apacked_np = np.concatenate(
                [_assign_np[k].ravel() for k in akeys]
            ).astype(np.dtype(dtype))
            aoff = np.cumsum([0] + [_assign_np[k].size for k in akeys])
            ashapes = [_assign_np[k].shape for k in akeys]
        else:
            apacked_np = np.zeros((0,), dtype=np.dtype(dtype))
            aoff, ashapes = [0], []

        def _materialize(packed, apacked):
            def unp(idx):
                a = packed[int(offs[idx]) : int(offs[idx + 1])]
                return a.reshape(_pack_meta[idx])

            def build(sd) -> LevelArrays:
                rows = unp(sd["rows"])
                prows = unp(sd["prows"])
                return LevelArrays(
                    rows=rows,
                    prows=prows,
                    rmask=rows < n,
                    pmask=prows < n,
                    lp_pos=unp(sd["lp_pos"]),
                    anc_blocks=unp(sd["anc_blocks"]),
                    block_ids=unp(sd["block_ids"]),
                )

            return (
                tuple(build(s) for s in staged),
                tuple(build(s) for s in staged_pred),
                {k: unp(i) for k, i in _ancpos_idx.items()},
                {
                    k: apacked[int(aoff[i]) : int(aoff[i + 1])].reshape(ashapes[i])
                    for i, k in enumerate(akeys)
                },
            )

        def _unp_host(idx):
            a = packed_np[int(offs[idx]) : int(offs[idx + 1])]
            return a.reshape(_pack_meta[idx])

        def _build_host(sd) -> LevelArrays:
            rows = _unp_host(sd["rows"])
            prows = _unp_host(sd["prows"])
            return LevelArrays(
                rows=rows,
                prows=prows,
                rmask=rows < n,
                pmask=prows < n,
                lp_pos=_unp_host(sd["lp_pos"]),
                anc_blocks=_unp_host(sd["anc_blocks"]),
                block_ids=_unp_host(sd["block_ids"]),
            )

        self.levels = [_build_host(s) for s in staged]
        self.pred_arrays = [_build_host(s) for s in staged_pred] or None
        self.anc_pos.update({k: _unp_host(i) for k, i in _ancpos_idx.items()})
        self.assign.update(
            {k: _assign_np[k].astype(np.dtype(dtype)) for k in akeys}
        )
        self._host_staged = True
        self._stage = (packed_np, apacked_np, _materialize)

        # total device bytes of the model arrays: used to decide whether the
        # samplers may close over the model (baking every array into the
        # program as constants lets XLA fold the static index arrays and pick
        # better layouts -- measured 39 -> 31 ms/iteration at n=1e5 -- but
        # makes program size O(n), which breaks compilation at n ~ 1e6)
        leaves, _ = _ms_flatten(self)
        self.approx_device_bytes = float(sum(
            a.size * a.dtype.itemsize
            for a in jax.tree.leaves(leaves) if hasattr(a, "size")
        ))


    def materialize_device(self) -> "ModelStatic":
        """Ship the host staging buffers to device: one bulk transfer per
        packed buffer + ONE jitted unpack program for the derived leaves,
        plus dtype-matched puts (which compile nothing) for the global
        row-indexed arrays.  Required before ms is passed as a jit ARGUMENT
        (argument-mode sampling, sharding, post-fit prediction) -- numpy
        leaves would otherwise be transferred one put at a time, which
        dominated setup at n ~ 1e6 through the high-overhead device link.
        Idempotent; const-model runs never call it."""
        if not getattr(self, "_host_staged", False):
            return self
        packed_np, apacked_np, _materialize = self._stage
        # retain the host-resident leaf values (numpy views into the packed
        # staging buffers -- near-free) so a later hybrid const_model split
        # can still constant-fold the small leaves after materialization
        # (mcmc._split_big_leaves); without this, hybrid silently degrades
        # to pure argument mode on the eager-init / checkpoint-load paths
        arrays, _static = _ms_flatten(self)
        self._host_leaves = jax.tree.leaves(arrays)
        from spamtree_tpu.utils.execcache import cached_compile

        packed_dev = jnp.asarray(packed_np, dtype=jnp.int32)
        # the unpack program is O(levels); its remote compile rides the
        # serialized-executable cache like the samplers' programs
        unpack = cached_compile(
            jax.jit(_materialize).lower(packed_dev, apacked_np)
        )
        levels, preds, ancpos, assigns = unpack(packed_dev, apacked_np)
        self.levels = list(levels)
        self.pred_arrays = list(preds) or None
        self.anc_pos = dict(ancpos)
        self.assign = dict(assigns)
        for f in ("coords", "mv", "y", "X", "obs_mask", "mv_onehot_obs",
                  "mv_onehot", "XtX"):
            setattr(self, f, jnp.asarray(getattr(self, f)))
        self._host_staged = False
        del self._stage
        return self

    # mv id per padded row index, sentinel -> margin 0 (always masked out)
    def tausq_long(self, tausq_inv):
        """(n+1,) per-row noise precision; sentinel slot = 0."""
        t = tausq_inv[self.mv]
        return t.at[self.n].set(0.0)


# ModelStatic is a registered pytree so the samplers take it as a jit
# ARGUMENT instead of a closure.  Closed-over device arrays are inlined into
# the lowered StableHLO as literal constants, which makes module size O(n)
# (64 MB of IR at n=1e5, ~600 MB at n=1e6 -- blowing both compile time and
# the remote-compile transport); as pytree leaves they become ordinary XLA
# parameters and the program is O(levels).
_MS_ARRAY_FIELDS = (
    "levels", "pred_arrays", "coords", "mv", "y", "X", "obs_mask",
    "mv_onehot_obs", "mv_onehot", "XtX", "n_obs_by_q",
)
_MS_STATIC_FIELDS = (
    "spec", "dtype", "factor_dtype", "use_pallas", "n", "p", "q", "limited_tree",
    "level_chunks", "pred_chunks", "level_is_ref", "level_group_c",
    "level_aligned", "pred_aligned", "level_lp", "level_segs",
    "pred_lp", "serves_as_parent", "serves_as_sweep_parent",
    "last_consumer", "seg_level", "pred_in_carry", "joint_pad",
)


def _freeze(v):
    if isinstance(v, tuple) and hasattr(v, "_fields"):  # NamedTuple (CovModel)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    return v


def _ms_flatten(ms: "ModelStatic"):
    arrays = [getattr(ms, f) for f in _MS_ARRAY_FIELDS]
    arrays.append(dict(ms.assign))
    arrays.append(dict(ms.anc_pos))
    static = tuple(_freeze(getattr(ms, f)) for f in _MS_STATIC_FIELDS)
    return arrays, static


def _ms_unflatten(static, arrays):
    ms = object.__new__(ModelStatic)
    ms.sched = None  # host-side metadata is not carried through jit
    for f, v in zip(_MS_ARRAY_FIELDS, arrays[: len(_MS_ARRAY_FIELDS)]):
        setattr(ms, f, v)
    ms.assign = arrays[len(_MS_ARRAY_FIELDS)]
    ms.anc_pos = arrays[len(_MS_ARRAY_FIELDS) + 1]
    for f, v in zip(_MS_STATIC_FIELDS, static):
        if f in ("level_chunks", "pred_chunks", "level_is_ref",
                 "level_group_c", "level_aligned", "pred_aligned",
                 "level_lp", "serves_as_parent", "serves_as_sweep_parent",
                 "joint_pad"):
            v = list(v)
        elif f == "level_segs":
            v = [(list(a), list(b)) for a, b in v]
        elif f == "seg_level":
            v = [list(x) for x in v]
        elif f == "last_consumer":
            v = dict(v)
        setattr(ms, f, v)
    return ms


jax.tree_util.register_pytree_node(ModelStatic, _ms_flatten, _ms_unflatten)


def _apply_parent_factor(parent_joint, lp_pos, Kxc, gc: int,
                         aligned: bool = False, need_H: bool = True):
    """Conditional-mean machinery M = LAi Kxc, H = Kxc' LAi' LAi.

    With ``gc > 1`` the level is parent-major in groups of gc children
    (schedule._group_ref_plan), so the (P, P) parent joint factor -- the
    largest operand of the sweep -- is gathered once per *parent* and applied
    to all children as one batched GEMM with a (P, gc*S) right-hand side.
    Returns (M, H, LAi) where LAi is (B, P, P) for gc == 1 and (G, P, P)
    grouped otherwise (callers broadcast for the joint-factor assembly).
    ``need_H=False`` (decision-only sweep) skips materializing the (B, S, P)
    H tensor and returns None in its slot: the MH decision needs only
    M-derived quantities (Schur complement M'M, prior mean via _hw_from_M,
    thin-level diag via sum_p M^2).
    """
    B, P, S = Kxc.shape
    if gc <= 1:
        # aligned levels (schedule._align_to_parent) match the factor batch
        # element-for-element: straight stream, no row gather
        LAi = parent_joint if aligned else parent_joint[lp_pos]  # (B, P, P)
        M = LAi @ Kxc  # (B, P, S)
        H = jnp.einsum("bps,bpq->bsq", M, LAi) if need_H else None
        return M, H, LAi
    G = B // gc
    LAi = parent_joint[lp_pos[::gc]]  # (G, P, P)
    Kxc4 = Kxc.reshape(G, gc, P, S)
    M4 = jnp.einsum("gpq,gcqs->gcps", LAi, Kxc4)
    H = (jnp.einsum("gcps,gpq->gcsq", M4, LAi).reshape(B, S, P)
         if need_H else None)
    return M4.reshape(B, P, S), H, LAi


def _hw_from_M(M, LAi, wpar, gc: int):
    """Prior conditional mean H wpar = M' (LAi wpar) WITHOUT materializing
    H -- the decision-only sweep's replacement for einsum('bsp,bp->bs', H,
    wpar).  Exact: H = Kxc' LAi' LAi = M' LAi by definition."""
    B, P, S = M.shape
    if gc <= 1:
        u = jnp.einsum("bpq,bq->bp", LAi, wpar)
        return jnp.einsum("bps,bp->bs", M, u)
    G = B // gc
    u = jnp.einsum("gpq,gcq->gcp", LAi, wpar.reshape(G, gc, P))
    return jnp.einsum(
        "gcps,gcp->gcs", M.reshape(G, gc, P, S), u
    ).reshape(B, S)


def _assemble_joint(LAi, Rinv, H, P, S, gc, dtype, pad: int = 0):
    """Joint inverse-Cholesky factor J = [[LAi, 0], [-Rinv H, Rinv]].

    Concatenation instead of zeros + dynamic-update-slices: XLA lowers the
    .at[].set chain to full-tensor copies (measured 3.6 ms for the deepest
    level's (1024, 296, 296) at n=1e5 -- 4x the pure write cost); the concat
    form writes each element exactly once (~0.9 ms).

    ``pad > 0`` appends identity rows/cols (the 128-aligned joint layout's
    sentinel tail, schedule joint_align): J_pad = [[J, 0], [0, I]].  Exact
    by identity-padding semantics -- the sentinel slots' Kxc rows are masked
    to zero in every consumer.
    """
    B = Rinv.shape[0]
    if P == 0:
        J = Rinv
    else:
        LAi_b = (
            LAi if gc <= 1 else jnp.broadcast_to(
                LAi[:, None], (B // gc, gc, P, P)
            ).reshape(B, P, P)
        )
        top = jnp.concatenate(
            [LAi_b, jnp.zeros((B, P, S), dtype=dtype)], axis=2
        )
        bot = jnp.concatenate(
            [-jnp.einsum("bst,btp->bsp", Rinv, H), Rinv], axis=2
        )
        J = jnp.concatenate([top, bot], axis=1)
    if pad:
        W = J.shape[-1]
        top = jnp.concatenate(
            [J, jnp.zeros((B, W, pad), dtype=J.dtype)], axis=2
        )
        eye = jnp.broadcast_to(
            jnp.eye(pad, dtype=J.dtype)[None], (B, pad, pad)
        )
        bot = jnp.concatenate(
            [jnp.zeros((B, pad, W), dtype=J.dtype), eye], axis=2
        )
        J = jnp.concatenate([top, bot], axis=1)
    return J


def _composed_enabled() -> bool:
    """A/B gate for the parts-composed decision sweep (trace-time env)."""
    return os.environ.get("SPAMTREE_COMPOSED_FACTORS", "1") not in (
        "0", "false", "")


def _compose_children(ms: ModelStatic, t: int) -> bool:
    """Decision-mode check: may ref level ``t`` emit factor PARTS
    (LAi, H, Rinv) instead of assembling its joint factor J?

    True when every sweep-level consumer is a thin parent-ALIGNED unchunked
    level whose parent layout is exactly [t's prows ; t's rows] -- then the
    child can apply J = [[LAi, 0], [-Rinv H, Rinv]] block-structured and the
    (B, P+S, P+S) joint (the sweep's largest tensor: 359 MB at n=1e5) is
    never written or re-read.  Limited trees keep the plain factor (their
    J is the small per-block inv-chol already)."""
    if ms.limited_tree or ms.level_chunks[t] != 1:
        return False
    consumers = [c for c in range(len(ms.levels)) if ms.level_lp[c] == t]
    if not consumers:
        return False
    P_t = ms.levels[t].prows.shape[1]
    S_t = ms.levels[t].rows.shape[1]
    return all(
        (not ms.level_is_ref[c])
        and ms.level_aligned[c]
        and ms.level_chunks[c] == 1
        and ms.level_group_c[c] <= 1
        and ms.levels[c].prows.shape[1] == P_t + S_t
        for c in consumers
    )


def _apply_parts_thin(parts, Kxc, wpar, dtype):
    """Thin-level decision quantities from parent factor PARTS.

    parts = (LAi, H, Rinv, gc_p) with LAi (G, Pp, Pp) grouped by the
    parent's parent-major groups (G = B/gc_p), H (B, Sp, Pp),
    Rinv (B, Sp, Sp); Kxc (B, P, S) with P = Pp + Sp rows ordered
    [parent's ancestors ; parent's rows] (the aligned-layout invariant).

    Exactly J @ Kxc and M'(J wpar) for J = [[LAi,0],[-Rinv H, Rinv]]:
      M_top = LAi K_anc
      M_bot = Rinv (K_par - H K_anc)
      hk    = sum_p M_top^2 + sum_s M_bot^2
      hw    = M_top' u_top + M_bot' u_bot,
      u_top = LAi w_anc ; u_bot = Rinv (w_par - H w_anc)
    Returns (hk, hw), both (B, S)."""
    LAi, H, Rinv, gc_p = parts
    B, P, S = Kxc.shape
    Pp = 0 if LAi is None else LAi.shape[-1]
    K_anc, K_par = Kxc[:, :Pp, :], Kxc[:, Pp:, :]
    w_anc, w_par = wpar[:, :Pp], wpar[:, Pp:]
    if Pp == 0:
        # parent is the root level: J = Rinv alone
        M_bot = jnp.einsum("bst,btu->bsu", Rinv, K_par)
        hk = jnp.sum(M_bot * M_bot, axis=1)
        u_bot = jnp.einsum("bst,bt->bs", Rinv, w_par)
        return hk, jnp.einsum("bsu,bs->bu", M_bot, u_bot)
    if gc_p <= 1:
        M_top = jnp.einsum("bpq,bqs->bps", LAi, K_anc)
        u_top = jnp.einsum("bpq,bq->bp", LAi, w_anc)
    else:
        G = B // gc_p
        M_top = jnp.einsum(
            "gpq,gcqs->gcps", LAi, K_anc.reshape(G, gc_p, Pp, S)
        ).reshape(B, Pp, S)
        u_top = jnp.einsum(
            "gpq,gcq->gcp", LAi, w_anc.reshape(G, gc_p, Pp)
        ).reshape(B, Pp)
    HK = jnp.einsum("bsp,bpt->bst", H, K_anc)
    M_bot = jnp.einsum("bst,btu->bsu", Rinv, K_par - HK)
    hk = jnp.sum(M_top * M_top, axis=1) + jnp.sum(M_bot * M_bot, axis=1)
    u_bot = jnp.einsum(
        "bst,bt->bs", Rinv, w_par - jnp.einsum("bsp,bp->bs", H, w_anc)
    )
    hw = (jnp.einsum("bps,bp->bs", M_top, u_top)
          + jnp.einsum("bsu,bs->bu", M_bot, u_bot))
    return hk, hw


def _wpar_from(wj_src, lp_pos, al: bool, gc: int):
    """wpar (B, P) for a level from its parent level's joint w rows: a
    B-row gather of (B, W)-row slabs -- or a direct read on aligned levels
    -- replacing the (B, P) SCALAR-index gather ``w[lvl.prows]``.

    Round-5 profiler finding (examples/profile_step.py): the per-level
    scalar-index w gathers were the step's single largest cost class
    (~2.2 ms for the leaf's (1024, 296) gather from a 400 KB vector --
    ~0.15 GB/s effective), hidden from the theta-only bisect because a
    constant w lets XLA hoist them out of the scan.  The layout identity
    ``prows[b] == joint_rows[lp][lp_pos[b]]`` (schedule.py) makes wpar a
    row gather of the parent's joint w instead.  Bit-identical values."""
    if al:
        return wj_src
    if gc > 1:
        # parent-major groups share their leader's parent pointers
        G = lp_pos.shape[0] // gc
        lead = wj_src[lp_pos[::gc]]  # (G, W)
        return jnp.broadcast_to(
            lead[:, None], (G, gc, wj_src.shape[1])
        ).reshape(-1, wj_src.shape[1])
    return wj_src[lp_pos]


def _wj_parents_needed(ms: ModelStatic, include_pred: bool = False) -> set:
    """Transitive closure of levels whose joint w rows feed some consumer's
    wpar (gibbs_w / the quad sweep / predict)."""
    need = set()
    stack = [ms.level_lp[t] for t in range(len(ms.levels))
             if ms.levels[t].prows.shape[1] > 0]
    if include_pred and ms.pred_lp >= 0:
        stack.append(ms.pred_lp)
    while stack:
        t = stack.pop()
        if t < 0 or t in need:
            continue
        need.add(t)
        if ms.levels[t].prows.shape[1] > 0:
            stack.append(ms.level_lp[t])
    return need


def _w_joints(ms: ModelStatic, w, need: set) -> dict:
    """Per-parent-level joint w rows {t: (B, W)} built root->leaf through
    the recursive layout (see _wpar_from): each level costs one small
    (B, S) gather + one concat instead of every consumer paying a (B, P)
    scalar-index gather."""
    wjs = {}
    for t in sorted(need):
        lvl = ms.levels[t]
        w_r = w[lvl.rows]
        if ms.limited_tree:
            # limited trees: children condition on the parent's rows alone
            wjs[t] = w_r
            continue
        P = lvl.prows.shape[1]
        if P == 0:
            wj = w_r
        else:
            wpar = _wpar_from(wjs[ms.level_lp[t]], lvl.lp_pos,
                              ms.level_aligned[t], ms.level_group_c[t])
            wj = jnp.concatenate([wpar, w_r], axis=1)
        if ms.joint_pad[t]:
            # sentinel tail of the 128-aligned joint layout: w[n] == 0
            wj = jnp.concatenate([
                wj, jnp.zeros((wj.shape[0], ms.joint_pad[t]), dtype=wj.dtype)
            ], axis=1)
        wjs[t] = wj
    return wjs


def level_coords(ms: ModelStatic):
    """Per-level (coords[rows], mv[rows], coords[prows], mv[prows]) tuples
    plus the prediction-bucket set -- the STATIC gathers of every sweep.

    Built once per chunk program call, OUTSIDE the iteration scan
    (mcmc._keep_body), and threaded through make_step -> sweep: inside the
    single-chain scan XLA hoists these loop-invariant gathers itself, but
    under the vmapped multi-chain step it does not, and they ran as
    pathological per-iteration scalar gathers (6.4 ms each at n=1e5 C=2,
    round-5 chains profile).  Computing them structurally outside the
    while loop guarantees the hoist on every path."""
    lvls = []
    for lvl in ms.levels:
        P = lvl.prows.shape[1]
        lvls.append((
            ms.coords[lvl.rows], ms.mv[lvl.rows],
            ms.coords[lvl.prows] if P > 0 else None,
            ms.mv[lvl.prows] if P > 0 else None,
        ))
    pred = []
    for lvl in (ms.pred_arrays or []):
        pred.append((ms.coords[lvl.rows], ms.mv[lvl.rows],
                     ms.coords[lvl.prows], ms.mv[lvl.prows]))
    return (tuple(lvls), tuple(pred))


def _bcov(ms: ModelStatic, params, cx1, mv1, cx2, mv2):
    """vmapped pairwise covariance over a leading block-batch axis."""
    return jax.vmap(lambda a, b, c, d: pairwise_cov(a, b, c, d, params, ms.spec))(
        cx1, mv1, cx2, mv2
    )


def _chunked(lvl: LevelArrays, nc: int) -> LevelArrays:
    """Reshape every per-level array to (nc, B/nc, ...) for sequential slabs."""
    return LevelArrays(
        *[a.reshape(nc, a.shape[0] // nc, *a.shape[1:]) for a in lvl]
    )


def _run_level(lvl, nc: int, carry, body):
    """Run a per-level body either whole (nc=1) or as nc sequential slabs.

    ``body(carry, lvl_slice) -> (carry, outs)``; chunked outputs are
    re-flattened along the block axis.  Sequential slabs bound peak HBM: the
    dominant (B, P, P) gathers/products exist for one slab at a time.
    ``lvl`` may be a LevelArrays or any pytree of (B, ...) arrays (the
    prediction paths bundle the level with its precomputed coords).
    """
    if nc == 1:
        return body(carry, lvl)
    if isinstance(lvl, LevelArrays):
        xs = _chunked(lvl, nc)
    else:
        xs = jax.tree.map(
            lambda a: a.reshape(nc, a.shape[0] // nc, *a.shape[1:]), lvl
        )
    carry, outs = jax.lax.scan(body, carry, xs)
    outs = jax.tree.map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), outs
    )
    return carry, outs


def sweep(ms: ModelStatic, theta, w, build_pred: bool = True,
          quad_prev: tuple | None = None, emit_pred_joint: bool = False,
          decision_only: bool = False, upto: int | None = None,
          coords_cache=None):
    """Full root->leaf likelihood sweep for a theta value.

    Returns (leveldata tuple, pred_data, logdetCi scalar, ok flag), the
    propagated identity-padded joint inverse-Cholesky factors replacing the
    reference's ``invchol_block_inplace_direct`` nested-ancestor update
    (spamtree_model.cpp:900-907).

    With ``quad_prev=prev_leveldata``, additionally returns
    ``(quad_new, quad_cur)``: the -0.5 w'Ci w quadratic forms under the NEW
    factors and under ``prev_leveldata``, fused into the level loop.  The
    reference gets wcore for free inside its sweep (spamtree_model.cpp:
    912-914); fusing both here removes two standalone ``quad_loglik`` passes
    per iteration that would otherwise re-read every (B,S,P)/(B,S,S) factor
    tensor from HBM.

    ``decision_only=True`` (requires quad_prev) computes ONLY the MH
    decision quantities and returns ``(logdet, ok, quad_new, quad_cur)``:
    no leveldata or prediction operators are emitted, the (B, S, P)
    conditional-mean operators H and the (B, S, S) precisions never
    materialize (M-derived forms replace them), and joint factors are
    propagated only to levels that later SWEEP levels consume.  This is the
    reject path of the accept-aware MCMC step (mcmc.make_step): the factor-
    emitting rebuild runs inside the accept branch of the cond, so the ~73%
    rejected proposals never pay the emission or the cond's output
    forwarding over the full factor set.

    ``upto`` truncates the level loop to ``ms.levels[:upto]`` — a
    measurement-only knob for per-level cost attribution
    (examples/bisect_levels.py).  The last included level's joint emission
    has no consumer and is DCE'd, so truncated timings attribute each
    level's emission to the level that consumes it.
    """
    if decision_only:
        assert quad_prev is not None, "decision_only requires quad_prev"
    params = unpack_theta(theta.astype(ms.dtype), ms.spec)
    leveldata = []
    logdet = jnp.zeros((), dtype=ms.dtype)
    qn = jnp.zeros((), dtype=ms.dtype)
    qc = jnp.zeros((), dtype=ms.dtype)
    ok = jnp.array(True)
    joints = {}
    # joint w rows per parent level, built alongside the factor propagation:
    # every consumer's wpar is then a row gather (or direct read when
    # aligned) instead of a (B, P) scalar-index gather -- the profiler-
    # measured dominant cost of the w-consuming sweep (see _wpar_from)
    wjs = {}
    wj_need = _wj_parents_needed(ms) if quad_prev is not None else set()
    if upto is not None:
        build_pred = False

    for t, lvl_full in list(enumerate(ms.levels))[:upto]:
        P = lvl_full.prows.shape[1]
        is_ref = ms.level_is_ref[t]
        gc = ms.level_group_c[t]
        al = ms.level_aligned[t]
        emit_joint = is_ref and (
            ms.serves_as_sweep_parent[t] if decision_only
            else ms.serves_as_parent[t]
        )
        parent_joint = joints.get(ms.level_lp[t]) if P > 0 else None
        prev_t = quad_prev[t] if quad_prev is not None else None
        S_lvl = lvl_full.rows.shape[1]
        if coords_cache is not None:
            cxr_full, mvr_full, cxp_full, mvp_full = coords_cache[0][t]
        else:
            cxr_full = ms.coords[lvl_full.rows]
            mvr_full = ms.mv[lvl_full.rows]
            cxp_full = ms.coords[lvl_full.prows] if P > 0 else None
            mvp_full = ms.mv[lvl_full.prows] if P > 0 else None
        w_r_full = wpar_full = None
        if quad_prev is not None:
            w_r_full = w[lvl_full.rows]
            if P > 0:
                wpar_full = _wpar_from(wjs[ms.level_lp[t]], lvl_full.lp_pos,
                                       al, gc)
            if is_ref and t in wj_need:
                if ms.limited_tree:
                    wj = w_r_full
                elif wpar_full is None:
                    wj = w_r_full
                else:
                    wj = jnp.concatenate([wpar_full, w_r_full], axis=1)
                if ms.joint_pad[t]:
                    wj = jnp.concatenate([
                        wj,
                        jnp.zeros((wj.shape[0], ms.joint_pad[t]),
                                  dtype=wj.dtype),
                    ], axis=1)
                wjs[t] = wj
        # decision mode: emit factor PARTS instead of the assembled joint
        # when every consumer can apply them block-structured (the (B, P+S,
        # P+S) joint -- 359 MB at n=1e5 -- is never written or re-read)
        compose = (
            decision_only and is_ref and emit_joint
            and _composed_enabled() and _compose_children(ms, t)
        )

        if (decision_only and not is_ref and P > 0 and gc <= 1
                and ms.level_chunks[t] == 1 and parent_joint is not None):
            kernel_ok = (
                not isinstance(parent_joint, tuple)
                and P <= pallas_level.MAX_P and S_lvl <= pallas_level.MAX_S
                and pallas_level.use_level_kernels(ms.dtype)
            )
            if kernel_ok or isinstance(parent_joint, tuple):
                lvl = lvl_full
                cxr, mvr, cxp, mvp = cxr_full, mvr_full, cxp_full, mvp_full
                Kxc = _bcov(ms, params, cxp, mvp, cxr, mvr)
                Kxc = Kxc * (lvl.pmask[:, :, None] & lvl.rmask[:, None, :])
                kdiag = jax.vmap(
                    lambda a, b: pairwise_cov_diag(a, b, params, ms.spec)
                )(cxr, mvr)
                if isinstance(parent_joint, tuple):
                    # composed parts: thin-level decision without the joint
                    w_r = w_r_full
                    wpar = wpar_full
                    hk, hw = _apply_parts_thin(
                        parent_joint, Kxc, wpar, ms.dtype
                    )
                    r = jnp.where(lvl.rmask, kdiag - hk, 1.0)
                    okl = jnp.isfinite(r) & (r > 0)
                    ok = ok & jnp.all(okl)
                    r = jnp.where(okl, r, 1.0)
                    logdet = logdet - 0.5 * jnp.sum(
                        jnp.where(lvl.rmask, jnp.log(r), 0.0)
                    )
                    wx = w_r - hw
                    qn = qn - 0.5 * jnp.sum(wx * wx / r)
                    wxc = w_r - jnp.einsum("bsp,bp->bs", prev_t.H, wpar)
                    qc = qc - 0.5 * jnp.sum(prev_t.prec * wxc * wxc)
                else:
                    # fused thin-level kernel: the whole level (cov apply,
                    # conditional variance, both quadratic forms) as ONE
                    # pallas_call -- the (B, P, P) factor batch streams
                    # through VMEM once, no intermediate returns to HBM
                    ld_b, ok_b, qn_b, qc_b = pallas_level.thin_decision_level(
                        Kxc, parent_joint, lvl.lp_pos, wpar_full,
                        w_r_full, prev_t.H, prev_t.prec, kdiag,
                        lvl.rmask.astype(ms.dtype),
                        aligned=al, interpret=pallas_level._interpret(),
                    )
                    logdet = logdet + ld_b
                    ok = ok & ok_b
                    qn = qn + qn_b
                    qc = qc + qc_b
                for k in [k for k, last in ms.last_consumer.items()
                          if last == t]:
                    joints.pop(k, None)
                    wjs.pop(k, None)
                continue

        def level_body(carry, args, P=P, is_ref=is_ref, emit_joint=emit_joint,
                       parent_joint=parent_joint, gc=gc, al=al,
                       compose=compose, jpad=ms.joint_pad[t]):
            logdet, ok, qn, qc = carry
            lvl, prev, w_r, wpar, cxr, mvr, cxp, mvp = args
            B, S = lvl.rows.shape
            if quad_prev is None or P == 0:
                wpar = None
            need_H = (not decision_only) or emit_joint
            if P > 0:
                Kxc = _bcov(ms, params, cxp, mvp, cxr, mvr)
                Kxc = Kxc * (lvl.pmask[:, :, None] & lvl.rmask[:, None, :])
                M, H, LAi = _apply_parent_factor(
                    parent_joint, lvl.lp_pos, Kxc, gc, al, need_H
                )
            else:
                Kxc = M = LAi = None
                H = jnp.zeros((B, S, 0), dtype=ms.dtype)

            def _hw():
                # prior conditional mean H wpar; via M when H was skipped
                if P == 0:
                    return 0.0
                if H is not None:
                    return jnp.einsum("bsp,bp->bs", H, wpar)
                return _hw_from_M(M, LAi, wpar, gc)

            if is_ref:
                Kcc = _bcov(ms, params, cxr, mvr, cxr, mvr)
                Rcc = identity_pad(Kcc, lvl.rmask)
                if P > 0:
                    Rcc = Rcc - jnp.einsum("bps,bpt->bst", M, M)
                L, Rinv, okl = chol_inv_masked(
                    Rcc, lvl.rmask, ms.use_pallas and S <= 64
                )
                logdet = logdet + jnp.sum(
                    jnp.log(jnp.diagonal(Rinv, axis1=-2, axis2=-1))
                )
                ok = ok & jnp.all(okl)
                if quad_prev is not None:
                    wx = w_r - (_hw() if P > 0 else 0.0)
                    v = jnp.einsum("bst,bt->bs", Rinv, wx)
                    qn = qn - 0.5 * jnp.sum(v * v)
                    wxc = w_r - (jnp.einsum("bsp,bp->bs", prev.H, wpar)
                                 if P > 0 else 0.0)
                    qc = qc - 0.5 * jnp.einsum("bs,bst,bt->", wxc, prev.prec, wxc)
                J = None
                if emit_joint and not compose:
                    if ms.limited_tree:
                        # limited tree: children condition on this block's
                        # rows alone -> factor is inv-chol of the raw Kcc
                        # (reference: spamtree_model.cpp:901-903)
                        Lp, Jp, okp = chol_inv_masked(
                            Kcc, lvl.rmask, ms.use_pallas and S <= 64
                        )
                        ok = ok & jnp.all(okp)
                        J = Jp
                    else:
                        J = _assemble_joint(LAi, Rinv, H, P, S, gc, ms.dtype,
                                            pad=jpad)
                    if ms.factor_dtype is not None:
                        # storage-only downcast: consumers upcast in-register
                        # inside the child-apply GEMMs (see __init__ note)
                        J = J.astype(ms.factor_dtype)
                if decision_only:
                    if emit_joint and compose:
                        # factor parts; the thin consumers apply them
                        # block-structured (_apply_parts_thin)
                        outs = (LAi, H, Rinv)
                    elif emit_joint:
                        outs = (J,)
                    else:
                        outs = ()
                    return (logdet, ok, qn, qc), outs
                prec = jnp.einsum("bks,bkt->bst", Rinv, Rinv)
                outs = (H, prec, J) if emit_joint else (H, prec)
                return (logdet, ok, qn, qc), outs
            else:
                kdiag = jax.vmap(
                    lambda a, b: pairwise_cov_diag(a, b, params, ms.spec)
                )(cxr, mvr)
                if P == 0:
                    hk = 0.0
                elif H is not None:
                    hk = jnp.einsum("bsp,bps->bs", H, Kxc)
                else:
                    # diag(H Kxc) = diag(M' M) = sum_p M^2
                    hk = jnp.sum(M * M, axis=1)
                r = jnp.where(lvl.rmask, kdiag - hk, 1.0)
                okl = jnp.isfinite(r) & (r > 0)
                ok = ok & jnp.all(okl)
                r = jnp.where(okl, r, 1.0)
                logdet = logdet + (-0.5) * jnp.sum(
                    jnp.where(lvl.rmask, jnp.log(r), 0.0)
                )
                if quad_prev is not None:
                    wx = w_r - (_hw() if P > 0 else 0.0)
                    qn = qn - 0.5 * jnp.sum(wx * wx / r)
                    wxc = w_r - (jnp.einsum("bsp,bp->bs", prev.H, wpar)
                                 if P > 0 else 0.0)
                    qc = qc - 0.5 * jnp.sum(prev.prec * wxc * wxc)
                if decision_only:
                    return (logdet, ok, qn, qc), ()
                return (logdet, ok, qn, qc), (H, 1.0 / r)

        nc = ms.level_chunks[t]
        if prev_t is None:
            # dummy second xs element so chunked scans have a uniform shape
            prev_arg = LevelData(H=lvl_full.lp_pos, prec=lvl_full.lp_pos)
        else:
            prev_arg = prev_t
        # structural fillers (unread) keep the xs tuple uniform for scans
        filler = lvl_full.lp_pos
        w_r_arg = w_r_full if w_r_full is not None else filler
        wpar_arg = wpar_full if wpar_full is not None else filler
        cxp_arg = cxp_full if cxp_full is not None else filler
        mvp_arg = mvp_full if mvp_full is not None else filler
        xs_args = (w_r_arg, wpar_arg, cxr_full, mvr_full, cxp_arg, mvp_arg)
        if nc == 1:
            (logdet, ok, qn, qc), outs = level_body(
                (logdet, ok, qn, qc), (lvl_full, prev_arg, *xs_args)
            )
        else:
            prev_c = LevelData(
                *[a.reshape(nc, a.shape[0] // nc, *a.shape[1:]) for a in prev_arg]
            )
            _csh = lambda a: a.reshape(nc, a.shape[0] // nc, *a.shape[1:])
            (logdet, ok, qn, qc), outs = jax.lax.scan(
                level_body, (logdet, ok, qn, qc),
                (_chunked(lvl_full, nc), prev_c,
                 *(_csh(a) for a in xs_args)),
            )
            outs = jax.tree.map(
                lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), outs
            )
        if decision_only:
            if emit_joint and compose:
                joints[t] = (*outs, gc)  # (LAi, H, Rinv, gc_p) parts
            elif emit_joint:
                joints[t] = outs[0]
        elif emit_joint:
            H, prec, J = outs
            joints[t] = J
            leveldata.append(LevelData(H=H, prec=prec))
        else:
            H, prec = outs
            leveldata.append(LevelData(H=H, prec=prec))

        # drop joint factors whose last consumer has now run (HBM liveness)
        for k in [k for k, last in ms.last_consumer.items() if last == t]:
            joints.pop(k, None)
            wjs.pop(k, None)

    if decision_only:
        return logdet, ok, qn, qc

    # prediction operators: conditional mean map H and per-location variance r
    # for the all-missing blocks, computed while the ancestor factors are
    # live.  The accept-swap then keeps them consistent with theta, making
    # per-iteration prediction a matmul + scaled draw (the reference instead
    # lazily rebuilds Kxx_inv at predict time; predict_std
    # spamtree_model.cpp:1256-1296).  At large n the operators don't fit the
    # carry (pred_in_carry False) and are recomputed per kept iteration via
    # predict_recompute instead.
    pred_data = None
    if ms.pred_arrays is not None and ms.pred_in_carry and build_pred:
        if emit_pred_joint:
            # return the raw deepest-reference joint factor instead of the
            # built (H, r) operators: the MCMC step defers _pred_operators
            # behind its accept-cond, so the ~73% rejected proposals never
            # pay the prediction-operator build at all
            pred_data = joints.get(ms.pred_lp)
        else:
            pred_data = _pred_operators(ms, params, joints.get(ms.pred_lp))

    if quad_prev is not None:
        return tuple(leveldata), pred_data, logdet, ok, qn, qc
    return tuple(leveldata), pred_data, logdet, ok


def pred_operators_from_joint(ms: ModelStatic, theta, parent_joint,
                              coords_cache=None) -> tuple:
    """Build the prediction (H, r) operators from a theta and the raw
    deepest-reference joint factor emitted by ``sweep(emit_pred_joint=True)``.
    Called from the MCMC step's accept-cond so rejected proposals skip it."""
    return _pred_operators(
        ms, unpack_theta(theta.astype(ms.dtype), ms.spec), parent_joint,
        coords_cache,
    )


def _pred_operators(ms: ModelStatic, params, parent_joint,
                    coords_cache=None) -> tuple:
    """Per-bucket (H, r) conditional operators for the prediction blocks,
    given the deepest-reference joint inverse-Cholesky factors.
    ``coords_cache`` (core.level_coords) supplies the static coordinate
    gathers hoisted outside the caller's scan."""

    def pred_body(carry, args, al=False):
        lvl, cxr, mvr, cxp, mvp = args
        Kxc = _bcov(ms, params, cxp, mvp, cxr, mvr)
        Kxc = Kxc * (lvl.pmask[:, :, None] & lvl.rmask[:, None, :])
        M, H, _ = _apply_parent_factor(parent_joint, lvl.lp_pos, Kxc, 1, al)
        kdiag = jax.vmap(
            lambda a, b: pairwise_cov_diag(a, b, params, ms.spec)
        )(cxr, mvr)
        r = kdiag - jnp.einsum("bsp,bps->bs", H, Kxc)
        # chol-failure -> deterministic mean (reference: .cpp:1316-1322)
        r = jnp.where(jnp.isfinite(r) & (r > 0), r, 0.0)
        return carry, (H, r)

    out = []
    for bi, (plvl, nc, al) in enumerate(
        zip(ms.pred_arrays, ms.pred_chunks, ms.pred_aligned)
    ):
        if coords_cache is not None:
            cx = coords_cache[1][bi]
        else:
            cx = (ms.coords[plvl.rows], ms.mv[plvl.rows],
                  ms.coords[plvl.prows], ms.mv[plvl.prows])
        _, (Hp, rp) = _run_level(
            (plvl, *cx), nc, None, partial(pred_body, al=al)
        )
        out.append(LevelData(H=Hp, prec=rp))  # prec slot holds variance r
    return tuple(out)


def _joints_upto(ms: ModelStatic, params, upto: int):
    """Lean re-propagation of the joint inverse-Cholesky factors through the
    reference levels 0..upto (no H/prec/loglik outputs) -- used by
    predict_recompute when the prediction operators are too big to carry."""
    joints = {}
    for t in range(upto + 1):
        assert ms.level_is_ref[t], "prediction ancestors must be ref levels"
        lvl_full = ms.levels[t]
        P = lvl_full.prows.shape[1]
        gc = ms.level_group_c[t]
        parent_joint = joints.get(ms.level_lp[t]) if P > 0 else None

        def body(carry, lvl, P=P, parent_joint=parent_joint, gc=gc,
                 jpad=ms.joint_pad[t]):
            B, S = lvl.rows.shape
            cxr = ms.coords[lvl.rows]
            mvr = ms.mv[lvl.rows]
            Kcc = _bcov(ms, params, cxr, mvr, cxr, mvr)
            Rcc = identity_pad(Kcc, lvl.rmask)
            if P > 0:
                cxp = ms.coords[lvl.prows]
                mvp = ms.mv[lvl.prows]
                Kxc = _bcov(ms, params, cxp, mvp, cxr, mvr)
                Kxc = Kxc * (lvl.pmask[:, :, None] & lvl.rmask[:, None, :])
                M, H, LAi = _apply_parent_factor(
                    parent_joint, lvl.lp_pos, Kxc, gc
                )
                Rcc = Rcc - jnp.einsum("bps,bpt->bst", M, M)
            if ms.limited_tree:
                _, J, _ = chol_inv_masked(Kcc, lvl.rmask,
                                          ms.use_pallas and S <= 64)
            else:
                _, Rinv, _ = chol_inv_masked(Rcc, lvl.rmask,
                                             ms.use_pallas and S <= 64)
                J = _assemble_joint(
                    LAi if P > 0 else None, Rinv, H if P > 0 else None,
                    P, S, gc, ms.dtype, pad=jpad,
                )
            if ms.factor_dtype is not None:
                J = J.astype(ms.factor_dtype)
            return carry, (J,)

        _, (J,) = _run_level(lvl_full, ms.level_chunks[t], None, body)
        joints[t] = J
        if ms.level_lp[t] >= 0:
            joints.pop(ms.level_lp[t], None)
    return joints[upto]


def quad_loglik(ms: ModelStatic, leveldata, w):
    """-0.5 * sum of block quadratic forms (wcore) under the stored factors.

    Equivalent of ``get_loglik_w_std`` minus the theta-independent constant
    (reference: spamtree_model.cpp:781-826).
    """
    total = jnp.zeros((), dtype=ms.dtype)
    for t, lvl in enumerate(ms.levels):
        data = leveldata[t]
        P = lvl.prows.shape[1]
        w_x = w[lvl.rows]
        if P > 0:
            w_x = w_x - jnp.einsum("bsp,bp->bs", data.H, w[lvl.prows])
        if ms.level_is_ref[t]:
            total = total - 0.5 * jnp.einsum("bs,bst,bt->", w_x, data.prec, w_x)
        else:
            total = total - 0.5 * jnp.sum(data.prec * w_x * w_x)
    return total


def msg_gram(ms: ModelStatic, leveldata):
    """Per-segment Gibbs-message Gram blocks G_aa = H_a' prec H_a.

    These depend ONLY on the stored factors (H, prec), which change only when
    a theta proposal is ACCEPTED -- so the sampler computes them once per
    acceptance (make_step: lax.cond on accept, ~0.27 acceptance at the
    benchmark configs) instead of inside every gibbs_w call.  The reference
    rebuilds the equivalent Sigi_children products per Gibbs pass
    (spamtree_model.cpp:1158-1210); here they are carried state.

    Returns a tuple over levels of tuples over ancestor segments of
    (B, s_a, s_a) arrays (empty tuple at parentless levels).
    """
    out = []
    for t, lvl in enumerate(ms.levels):
        data = leveldata[t]
        P = lvl.prows.shape[1]
        if P == 0:
            out.append(())
            continue
        seg_off, seg_size = ms.level_segs[t]
        Gs = []
        for o, sa in zip(seg_off, seg_size):
            H_a = data.H[:, :, o : o + sa]
            if ms.level_is_ref[t]:
                t_a = jnp.einsum("bst,btq->bsq", data.prec, H_a)
            else:
                t_a = data.prec[:, :, None] * H_a
            Gs.append(jnp.einsum("bsp,bsq->bpq", H_a, t_a))
        out.append(tuple(Gs))
    return tuple(out)


def _route_messages(ms: ModelStatic, acc: dict, t: int, seg_off, outs,
                    vs_only: bool = False):
    """Route a level's per-segment Gibbs messages to their parent levels:
    dense assignment GEMM when the routing matrix is small enough, else a
    position scatter-add into the parent-level accumulator.

    ``vs_only=True`` (the carried-``routed`` fast path, see
    :func:`route_gram`) routes only the w-dependent mean messages ``vs``;
    the Gram halves are w-independent and come precomputed per accepted
    theta, so the per-iteration (Bp, Sp, Sp) routing GEMMs disappear."""
    Gs, vs = outs
    for a in range(len(seg_off)):
        tp = ms.seg_level[t][a]
        Bp, Sp = ms.levels[tp].rows.shape
        if tp not in acc:
            acc[tp] = (
                None if vs_only
                else jnp.zeros((Bp, Sp, Sp), dtype=ms.dtype),
                jnp.zeros((Bp, Sp), dtype=ms.dtype),
            )
        if (t, a) in ms.assign:
            A = ms.assign[(t, a)]  # (Bp, Bc)
            add_m = A @ vs[a]
            if vs_only:
                acc[tp] = (None, acc[tp][1] + add_m)
            else:
                add_S = jnp.einsum("pc,cij->pij", A, Gs[a])
                acc[tp] = (acc[tp][0] + add_S, acc[tp][1] + add_m)
        else:
            pvec = ms.anc_pos[(t, a)]  # (Bc,) sentinel Bp
            am = jnp.zeros((Bp + 1, Sp), dtype=ms.dtype)
            am = am.at[pvec].add(vs[a])
            if vs_only:
                acc[tp] = (None, acc[tp][1] + am[:Bp])
            else:
                aS = jnp.zeros((Bp + 1, Sp, Sp), dtype=ms.dtype)
                aS = aS.at[pvec].add(Gs[a])
                acc[tp] = (acc[tp][0] + aS[:Bp], acc[tp][1] + am[:Bp])


def route_gram(ms: ModelStatic, gram):
    """Per-parent-level sums of the routed Gibbs-message Gram blocks.

    ``gibbs_w``'s child->parent Sigi accumulation splits into a w-dependent
    mean half (the ``vs`` vectors) and a w-INDEPENDENT Gram half: the routed
    ``G_aa = H_a' prec H_a`` blocks are pure functions of the stored factors,
    which change only on theta acceptance.  Routing them per iteration cost
    one (Bp, Sp, Sp) assignment GEMM / scatter-add per (level, segment) —
    ~20 serialized kernels per w-Gibbs at the n=1e5 depth-7 config, on a
    machine where each in-program kernel carries ~0.3 ms of dispatch latency
    (BENCH_RESULTS round-4 attribution).  This precomputes the per-level
    sums once per acceptance (make_step's accept-cond, next to
    :func:`msg_gram`); the accumulation order matches gibbs_w's leaf->root
    visit exactly, so the carried-routed path is bit-identical.

    Returns a tuple over levels: (Bp, Sp, Sp) for levels that receive
    messages, ``()`` otherwise.
    """
    acc = {}
    for t in reversed(range(len(ms.levels))):
        if ms.levels[t].prows.shape[1] == 0:
            continue
        seg_off, seg_size = ms.level_segs[t]
        Gs = gram[t]
        for a in range(len(seg_off)):
            tp = ms.seg_level[t][a]
            Bp, Sp = ms.levels[tp].rows.shape
            if tp not in acc:
                acc[tp] = jnp.zeros((Bp, Sp, Sp), dtype=ms.dtype)
            if (t, a) in ms.assign:
                A = ms.assign[(t, a)]
                acc[tp] = acc[tp] + jnp.einsum("pc,cij->pij", A, Gs[a])
            else:
                pvec = ms.anc_pos[(t, a)]
                aS = jnp.zeros((Bp + 1, Sp, Sp), dtype=ms.dtype)
                aS = aS.at[pvec].add(Gs[a])
                acc[tp] = acc[tp] + aS[:Bp]
    return tuple(acc.get(t, ()) for t in range(len(ms.levels)))


def gram_full(ms: ModelStatic, leveldata):
    """(msg_gram, route_gram) pair -- the accept-refreshed carried state."""
    g = msg_gram(ms, leveldata)
    return g, route_gram(ms, g)


def gibbs_w(ms: ModelStatic, leveldata, w, tausq_inv, XB, key, y=None,
            gram=None, routed=None, upto: int | None = None):
    """Leaf->root blocked Gibbs update of w with child->parent scatter-add
    message accumulation (reference: gibbs_sample_w_std,
    spamtree_model.cpp:1011-1226).

    ``gram`` (from :func:`msg_gram`, recomputed only on theta acceptance)
    supplies the per-segment message Gram blocks; when None they are formed
    in place (standalone callers, warm-up sweeps).  ``routed`` (from
    :func:`route_gram`, refreshed with gram) additionally supplies the
    per-parent-level SUMS of the routed Gram blocks, removing every
    per-iteration (Bp, Sp, Sp) Sigi-routing GEMM/scatter from the pass —
    bit-identical to routing in place (matching accumulation order).

    ``upto`` truncates the leaf->root loop to the deepest ``upto`` levels —
    measurement-only (examples/bisect_levels.py); undelivered parent messages
    are folded into the unread sentinel slot ``w[n]`` to keep them live."""
    n = ms.n
    if routed is not None:
        assert gram is not None, "routed requires the matching gram blocks"
    if y is None:
        y = ms.y
    tl = ms.tausq_long(tausq_inv)
    bigz = jax.random.normal(key, (n + 1,), dtype=ms.dtype)
    # per-parent-level accumulated messages: {t: (Sigi_x (B,S,S), Smu_x (B,S))}
    acc = {}

    # Every wpar read in the leaf->root pass sees PRE-pass ancestor values
    # (deeper updates never touch shallower rows), so the joint w rows per
    # parent level can be built once up front and every level's wpar becomes
    # a row gather / direct read instead of a (B, P) scalar-index gather --
    # the profiler-measured dominant cost of this pass (see _wpar_from).
    wjs = _w_joints(ms, w, _wj_parents_needed(ms))
    # one (n+1, 3) row-gather operand replaces the three separate per-level
    # scalar gathers of (tausq_inv, residual, noise)
    resid_full = tl * (y - XB)
    aux = jnp.stack([tl, resid_full, bigz], axis=-1)  # (n+1, 3)

    order = list(reversed(range(len(ms.levels))))
    if upto is not None:
        order = order[:upto]
    for t in order:
        lvl_full = ms.levels[t]
        data_full = leveldata[t]
        P = lvl_full.prows.shape[1]
        is_ref = ms.level_is_ref[t]
        seg_off, seg_size = ms.level_segs[t]
        nc = ms.level_chunks[t]
        acc_t = acc.pop(t, None)
        if routed is not None and is_ref and not isinstance(routed[t], tuple):
            # precomputed Sigi message sum for this level (see route_gram);
            # the in-place acc then carries only the w-dependent Smu half
            acc_t = (routed[t], acc_t[1] if acc_t is not None
                     else jnp.zeros(lvl_full.rows.shape, dtype=ms.dtype))
        gram_t = None
        if gram is not None and P > 0:
            gram_t = gram[t]

        # fused thin-level kernel: prior mean, posterior draw, and the full
        # parent message vector in ONE pallas_call (the stored (B, S, P)
        # operator H streams through VMEM once); the per-segment Gram
        # additions and parent routing stay outside -- cross-block GEMMs
        if (not is_ref and P > 0 and nc == 1 and acc_t is None
                and gram_t is not None
                and P <= pallas_level.MAX_P
                and lvl_full.rows.shape[1] <= pallas_level.MAX_S
                and pallas_level.use_level_kernels(ms.dtype)):
            lvl = lvl_full
            wpar = _wpar_from(wjs[ms.level_lp[t]], lvl.lp_pos,
                              ms.level_aligned[t], 1)
            a3 = aux[lvl.rows]
            ti = a3[..., 0]
            resid = a3[..., 1]
            wu, msg_full = pallas_level.thin_gibbs_level(
                leveldata[t].H, leveldata[t].prec, wpar, a3[..., 2],
                ti, resid, lvl.rmask.astype(ms.dtype),
                interpret=pallas_level._interpret(),
            )
            w = w.at[lvl.rows].set(wu)
            Gs, vs = [], []
            for a, (o, sa) in enumerate(zip(seg_off, seg_size)):
                G_aa = gram_t[a]
                msg_a = msg_full[:, o : o + sa] + jnp.einsum(
                    "bpq,bq->bp", G_aa, wpar[:, o : o + sa]
                )
                Gs.append(G_aa)
                vs.append(msg_a)
            outs = (tuple(Gs), tuple(vs))
            _route_messages(ms, acc, t, seg_off, outs,
                            vs_only=routed is not None)
            continue

        wj_src = wjs.get(ms.level_lp[t]) if P > 0 else None

        def level_body(w, args, P=P, is_ref=is_ref, acc_t=acc_t,
                       wj_src=wj_src, al=ms.level_aligned[t],
                       gc=ms.level_group_c[t]):
            lvl, data, acc_sl, gram_sl = args
            B, S = lvl.rows.shape
            wpar = (_wpar_from(wj_src, lvl.lp_pos, al, gc)
                    if P > 0 else None)
            a3 = aux[lvl.rows]  # [tausq_inv, residual, noise] per row
            ti = a3[..., 0]
            resid = a3[..., 1]
            z = a3[..., 2]
            hw_prior = (
                jnp.einsum("bsp,bp->bs", data.H, wpar)
                if P > 0
                else jnp.zeros((B, S), dtype=ms.dtype)
            )

            if is_ref:
                Sigi = data.prec + ti[:, :, None] * jnp.eye(S, dtype=ms.dtype)
                Smu = jnp.einsum("bst,bt->bs", data.prec, hw_prior) + resid
                if acc_sl is not None:
                    if acc_sl[0] is not None:
                        Sigi = Sigi + acc_sl[0]
                    Smu = Smu + acc_sl[1]
                if ms.use_pallas and S <= 64:
                    _, Lci, _ = chol_inv_masked(Sigi, lvl.rmask, True)
                    tmp = jnp.einsum("bst,bt->bs", Lci, Smu)
                    wu = jnp.einsum("bts,bt->bs", Lci, tmp + z)
                else:
                    Lg, _ = chol_masked(Sigi, lvl.rmask)
                    tmp = tri_solve(Lg, Smu[..., None])
                    wu = tri_solve(Lg, tmp + z[..., None], trans=True)[..., 0]
            else:
                sig = data.prec + ti
                smu = data.prec * hw_prior + resid
                wu = smu / sig + z / jnp.sqrt(sig)
            wu = jnp.where(lvl.rmask, wu, 0.0)
            w = w.at[lvl.rows].set(wu)

            if P > 0:
                # Gibbs messages to every parent (reference: .cpp:1158-1210).
                # msg_full = H' prec (w_u - H w_par), formed as two matvecs
                # (v = prec diff, then H'v) -- never materializing the
                # (B, P, S) operator H' prec.  Ancestor a's padded rows
                # occupy the static contiguous slice [off_a, off_a+s_a) of
                # the parent layout; only the per-ancestor diagonal Gram
                # blocks G_aa = H_a' prec H_a enter, and those come
                # precomputed (msg_gram, refreshed on theta accept) or are
                # formed in place.
                diff = wu - hw_prior
                if is_ref:
                    v = jnp.einsum("bst,bt->bs", data.prec, diff)
                else:
                    v = data.prec * diff
                msg_full = jnp.einsum("bsp,bs->bp", data.H, v)
                Gs, vs = [], []
                for a, (o, sa) in enumerate(zip(seg_off, seg_size)):
                    if gram_sl is not None:
                        G_aa = gram_sl[a]
                    else:
                        H_a = data.H[:, :, o : o + sa]
                        t_a = (jnp.einsum("bst,btq->bsq", data.prec, H_a)
                               if is_ref else data.prec[:, :, None] * H_a)
                        G_aa = jnp.einsum("bsp,bsq->bpq", H_a, t_a)
                    msg_a = msg_full[:, o : o + sa] + jnp.einsum(
                        "bpq,bq->bp", G_aa, wpar[:, o : o + sa]
                    )
                    Gs.append(G_aa)
                    vs.append(msg_a)
                if routed is not None:
                    # Gram halves route precomputed (route_gram); don't emit
                    # them through the chunked scan's output stacking
                    return w, ((), tuple(vs))
                return w, (tuple(Gs), tuple(vs))
            return w, ()

        if nc == 1:
            w, outs = level_body(w, (lvl_full, data_full, acc_t, gram_t))
        else:
            data_c = LevelData(
                *[a.reshape(nc, a.shape[0] // nc, *a.shape[1:]) for a in data_full]
            )
            _chunk_tree = lambda tr: jax.tree.map(
                lambda a: a.reshape(nc, a.shape[0] // nc, *a.shape[1:]), tr
            )
            acc_c = _chunk_tree(acc_t) if acc_t is not None else None
            gram_c = _chunk_tree(gram_t) if gram_t is not None else None

            def chunk_body(w, args, acc_is_none=acc_t is None,
                           gram_is_none=gram_t is None):
                lvl, data, acc_sl, gram_sl = args
                return level_body(w, (
                    lvl, data,
                    None if acc_is_none else acc_sl,
                    None if gram_is_none else gram_sl,
                ))

            filler = _chunked(lvl_full, nc)  # structural stand-in, unread
            xs = (
                _chunked(lvl_full, nc), data_c,
                acc_c if acc_t is not None else filler,
                gram_c if gram_t is not None else filler,
            )
            w, outs = jax.lax.scan(chunk_body, w, xs)
            outs = jax.tree.map(
                lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), outs
            )

        if P > 0:
            _route_messages(ms, acc, t, seg_off, outs,
                            vs_only=routed is not None)

    if upto is not None and acc:
        # truncated run: keep undelivered messages live (sentinel slot unread)
        extra = sum(
            (0.0 if v[0] is None else jnp.sum(v[0])) + jnp.sum(v[1])
            for v in acc.values()
        )
        w = w.at[n].add(extra)
    return w


def _wj_pred_need(ms: ModelStatic) -> set:
    """Ancestor chain of the prediction levels (for _w_joints)."""
    need = set()
    t = ms.pred_lp
    while t >= 0 and t not in need:
        need.add(t)
        t = ms.level_lp[t] if ms.levels[t].prows.shape[1] > 0 else -1
    return need


def predict(ms: ModelStatic, pred_data, w, key):
    """Conditional-normal draws at all-missing blocks
    (reference: predict_std, spamtree_model.cpp:1234-1358).

    The conditional-mean operator H and per-location variances r were built
    during the theta likelihood sweep (and swapped on accept), so this is
    just w = H w_par + sqrt(r) z per prediction block.  w_par comes through
    the incremental joint-w build (see _wpar_from) -- the prediction level's
    (B, P) scalar-index gather was the bulk of its measured 2.6 ms."""
    if ms.pred_arrays is None or pred_data is None:
        return w
    bigz = jax.random.normal(key, (ms.n + 1,), dtype=ms.dtype)
    wjs = _w_joints(ms, w, _wj_pred_need(ms))
    for lvl, pd, al in zip(ms.pred_arrays, pred_data, ms.pred_aligned):
        wpar = _wpar_from(wjs[ms.pred_lp], lvl.lp_pos, al, 1)
        mean = jnp.einsum("bsp,bp->bs", pd.H, wpar)
        wu = jnp.where(
            lvl.rmask, mean + jnp.sqrt(pd.prec) * bigz[lvl.rows], 0.0
        )
        w = w.at[lvl.rows].set(wu)
    return w


def predict_recompute(ms: ModelStatic, theta, w, key, coords_cache=None):
    """Prediction for the large-n regime (pred_in_carry False): re-propagate
    the reference-level factors for the current theta and rebuild the
    prediction operators chunk-by-chunk with the draw fused in (the full
    operator tensors never materialize).  Costs roughly half a likelihood
    sweep per kept iteration but keeps multi-GB tensors out of the carry."""
    if ms.pred_arrays is None:
        return w
    params = unpack_theta(theta.astype(ms.dtype), ms.spec)
    parent_joint = _joints_upto(ms, params, ms.pred_lp)
    bigz = jax.random.normal(key, (ms.n + 1,), dtype=ms.dtype)
    wjs = _w_joints(ms, w, _wj_pred_need(ms))

    def body(w, args, al=False):
        lvl, cxr, mvr, cxp, mvp = args
        Kxc = _bcov(ms, params, cxp, mvp, cxr, mvr)
        Kxc = Kxc * (lvl.pmask[:, :, None] & lvl.rmask[:, None, :])
        M, H, _ = _apply_parent_factor(parent_joint, lvl.lp_pos, Kxc, 1, al)
        kdiag = jax.vmap(
            lambda a, b: pairwise_cov_diag(a, b, params, ms.spec)
        )(cxr, mvr)
        r = kdiag - jnp.einsum("bsp,bps->bs", H, Kxc)
        r = jnp.where(jnp.isfinite(r) & (r > 0), r, 0.0)
        wpar = _wpar_from(wjs[ms.pred_lp], lvl.lp_pos, al, 1)
        mean = jnp.einsum("bsp,bp->bs", H, wpar)
        wu = jnp.where(lvl.rmask, mean + jnp.sqrt(r) * bigz[lvl.rows], 0.0)
        return w.at[lvl.rows].set(wu), None

    for bi, (plvl, nc, al) in enumerate(
        zip(ms.pred_arrays, ms.pred_chunks, ms.pred_aligned)
    ):
        if coords_cache is not None:
            cx = coords_cache[1][bi]
        else:
            cx = (ms.coords[plvl.rows], ms.mv[plvl.rows],
                  ms.coords[plvl.prows], ms.mv[plvl.prows])
        w, _ = _run_level((plvl, *cx), nc, w, partial(body, al=al))
    return w


def prior_sample_w(ms: ModelStatic, leveldata, key):
    """Draw w from the treed-DAG prior SpamTree_G(0, C_theta).

    Root->leaf: w_u = H_u w_par + L_u z with L_u L_u' = R_u, using the stored
    conditional precisions (for reference levels L_u = chol(prec)^-T; for
    thin levels scalar sqrt(1/prec)).  Used by the Geweke joint-distribution
    test and available for forward simulation from a fitted tree.
    """
    w = jnp.zeros((ms.n + 1,), dtype=ms.dtype)
    bigz = jax.random.normal(key, (ms.n + 1,), dtype=ms.dtype)
    for t, lvl in enumerate(ms.levels):
        data = leveldata[t]
        P = lvl.prows.shape[1]
        z = bigz[lvl.rows]
        mean = (
            jnp.einsum("bsp,bp->bs", data.H, w[lvl.prows])
            if P > 0
            else jnp.zeros(z.shape, dtype=ms.dtype)
        )
        if ms.level_is_ref[t]:
            # prec = Rinv' Rinv with Rinv = L^-1 -> draw = L z = solve(Lp', z)
            # where Lp = chol(prec) satisfies Lp Lp' = R^-1, so L = Lp^-T
            Lp, _ = chol_masked(data.prec, lvl.rmask)
            draw = tri_solve(Lp, z[..., None], trans=True)[..., 0]
        else:
            draw = z / jnp.sqrt(data.prec)
        wu = jnp.where(lvl.rmask, mean + draw, 0.0)
        w = w.at[lvl.rows].set(wu)
    return w


def _small_spd_sample(Si, rhs, z):
    """Batched N(Si^{-1} rhs, Si^{-1}) draw for tiny p via UNROLLED
    Cholesky + substitutions: a pure elementwise graph over the (q,)-batch
    that XLA fuses into ~one kernel, vs the custom-call cholesky + three
    triangular-solve kernels of the linalg path (each in-program kernel
    costs ~0.3 ms serialized dispatch on this machine; the beta/tausq tail
    measured +2.1 ms, VERDICT r4 item 7).  Si (q,p,p) SPD, rhs (q,p),
    z (q,p) standard normal -> (q,p) draw.  Same math as gibbs_beta's
    solve chain up to reassociation."""
    p = Si.shape[-1]
    L = [[None] * p for _ in range(p)]
    for i in range(p):
        for j in range(i + 1):
            s = Si[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    tvec = [None] * p
    for i in range(p):
        s = rhs[..., i]
        for k in range(i):
            s = s - L[i][k] * tvec[k]
        tvec[i] = s / L[i][i]
    mu = [None] * p
    for i in reversed(range(p)):
        s = tvec[i]
        for k in range(i + 1, p):
            s = s - L[k][i] * mu[k]
        mu[i] = s / L[i][i]
    d = [None] * p
    for i in reversed(range(p)):
        s = z[..., i]
        for k in range(i + 1, p):
            s = s - L[k][i] * d[k]
        d[i] = s / L[i][i]
    return jnp.stack([mu[i] + d[i] for i in range(p)], axis=-1)


def gibbs_beta_tausq(ms: ModelStatic, w, XB, key_q, key_b, tausq_ab,
                     beta_Vi, beta_Vim, y=None):
    """Fused tausq-Gibbs + beta-Gibbs + XB refresh (reference iteration
    order: gibbs_sample_tausq then gibbs_sample_beta,
    spamtree_fit.cpp:308-330; conjugate updates at
    spamtree_model.cpp:1360-1417).

    The two O(n) reductions -- tausq's residual sum of squares and beta's
    X'(y - w) -- ride ONE (p+1, n) x (n, 2q) GEMM instead of two einsum
    kernels, and the per-margin posterior solve chain is the unrolled
    _small_spd_sample (one fused kernel) for p <= 8.  Returns
    (tausq_inv, beta, XB).  Same draws as the separate gibbs_tausq /
    gibbs_beta calls with the same keys, up to summation reassociation
    (parity-gated in tests/test_model_core.py)."""
    n, p, q = ms.n, ms.p, ms.q
    if y is None:
        y = ms.y
    yw = y[:n] - w[:n]
    resid = yw - XB[:n]
    A = jnp.concatenate([ms.X, resid[:, None]], axis=1)  # (n, p+1)
    Bm = jnp.concatenate(
        [yw[:, None] * ms.mv_onehot_obs, resid[:, None] * ms.mv_onehot_obs],
        axis=1,
    )  # (n, 2q)
    C = A.T @ Bm  # (p+1, 2q): [[Xty, Xtr], [r'y, r'r]]
    Xty = C[:p, :q]
    r2 = C[p, q:]
    a = jnp.asarray(tausq_ab[0] + ms.n_obs_by_q / 2.0, dtype=ms.dtype)
    g = jax.random.gamma(key_q, a, dtype=ms.dtype)
    tausq_inv = g / (tausq_ab[1] + 0.5 * r2)

    zs = jax.random.normal(key_b, (p, q), dtype=ms.dtype)
    Si = tausq_inv[:, None, None] * ms.XtX + beta_Vi  # (q, p, p)
    rhs = beta_Vim[None, :] + tausq_inv[:, None] * Xty.T  # (q, p)
    if p <= 8:
        bj = _small_spd_sample(Si, rhs, zs.T)
    else:
        L = jnp.linalg.cholesky(Si)
        half = jax.lax.linalg.triangular_solve(
            L, rhs[..., None], left_side=True, lower=True
        )
        mu = jax.lax.linalg.triangular_solve(
            L, half, left_side=True, lower=True, transpose_a=True
        )[..., 0]
        bj = mu + jax.lax.linalg.triangular_solve(
            L, zs.T[..., None], left_side=True, lower=True, transpose_a=True
        )[..., 0]
    beta = bj.T  # (p, q)
    XBq = ms.X @ beta
    XBn = jnp.sum(XBq * ms.mv_onehot, axis=1)
    return tausq_inv, beta, jnp.append(
        XBn, jnp.zeros((1,), dtype=ms.dtype)
    )


def gibbs_tausq(ms: ModelStatic, w, XB, key, tausq_ab, y=None):
    """Conjugate Gamma update of noise precisions per margin
    (reference: gibbs_sample_tausq, spamtree_model.cpp:1393-1417)."""
    if y is None:
        y = ms.y
    resid = y[: ms.n] - XB[: ms.n] - w[: ms.n]
    r2 = jnp.einsum("i,ij->j", resid * resid, ms.mv_onehot_obs)
    a = jnp.asarray(tausq_ab[0] + ms.n_obs_by_q / 2.0, dtype=ms.dtype)
    scale = 1.0 / (tausq_ab[1] + 0.5 * r2)
    g = jax.random.gamma(key, a, dtype=ms.dtype)
    return g * scale


def gibbs_beta(ms: ModelStatic, w, tausq_inv, key, beta_Vi, beta_Vim, y=None):
    """Conjugate Normal update of regression coefficients per margin
    (reference: gibbs_sample_beta, spamtree_model.cpp:1364-1391)."""
    p, q = ms.p, ms.q
    if y is None:
        y = ms.y
    yw = y[: ms.n] - w[: ms.n]
    # (p, q): X' ((y - w) masked to observed margin j)
    Xty = jnp.einsum("ip,ij->pj", ms.X, yw[:, None] * ms.mv_onehot_obs)
    zs = jax.random.normal(key, (p, q), dtype=ms.dtype)
    # batched over margins: one (q, p, p) cholesky + three batched
    # triangular solves instead of q serialized chol/solve chains (each
    # in-program kernel costs ~0.3 ms dispatch on this machine,
    # BENCH_RESULTS round-4 attribution); same draws up to reassociation
    Si = tausq_inv[:, None, None] * ms.XtX + beta_Vi  # (q, p, p)
    L = jnp.linalg.cholesky(Si)
    rhs = (beta_Vim[None, :] + tausq_inv[:, None] * Xty.T)[..., None]
    half = jax.lax.linalg.triangular_solve(
        L, rhs, left_side=True, lower=True
    )
    mu = jax.lax.linalg.triangular_solve(
        L, half, left_side=True, lower=True, transpose_a=True
    )[..., 0]
    bj = mu + jax.lax.linalg.triangular_solve(
        L, zs.T[..., None], left_side=True, lower=True, transpose_a=True
    )[..., 0]
    beta = bj.T  # (p, q)
    XBq = ms.X @ beta  # (n, q)
    XB = jnp.sum(XBq * ms.mv_onehot, axis=1)
    XB = jnp.append(XB, jnp.zeros((1,), dtype=ms.dtype))
    return beta, XB
