"""Static treed-DAG schedule compiler.

Converts the ragged per-block structure produced by the partitioner into
dense, padded per-level arrays that the jitted MCMC kernels consume.  This is
the TPU-native replacement for the reference's per-block Armadillo field
indexing (``init_indexing``/``init_finalize``/``make_gibbs_groups``,
reference: src/spamtree_model.cpp:194-420):

* per level, blocks are padded to a common size ``S`` and parent sets to a
  common padded layout ``P`` (identity-padding semantics: padded slots behave
  as independent standard normals with zero cross-covariance, so all the
  linear algebra downstream is exact on the real slots);
* each block's padded parent layout *is* the padded joint layout
  ``[parents, rows]`` of its deepest reference ancestor, which is what makes
  the reference's nested inverse-Cholesky propagation
  (``invchol_block_inplace_direct``, src/tree_utils.cpp:194-208) a single
  batched gather per level here;
* the child->parent Gibbs messages (``u_is_which_col_f``/``this_is_jth_child``
  machinery, src/spamtree_model.cpp:355-420 and 1158-1210) become two static
  index arrays ``pblock``/``ppos`` mapping every parent slot to
  (owning block, position inside that block) for scatter-add accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from spamtree_tpu.tree.partition import TreeLevels


@dataclass
class LevelPlan:
    res: int  # 1-based level id
    is_ref: bool
    block_ids: np.ndarray  # (B,)
    rows: np.ndarray  # (B, S) int32, sentinel = n
    prows: np.ndarray  # (B, P) int32, sentinel = n (P may be 0)
    lp_pos: np.ndarray  # (B,) position of deepest ref ancestor in its level batch
    lp_level: int  # sweep index of the level providing propagated factors (-1 = root)
    pblock: np.ndarray  # (B, P) int32 owner block of each parent slot, sentinel n_blocks
    ppos: np.ndarray  # (B, P) int32 position within the owner's padded rows

    @property
    def B(self) -> int:
        return self.rows.shape[0]

    @property
    def S(self) -> int:
        return self.rows.shape[1]

    @property
    def P(self) -> int:
        return self.prows.shape[1]


@dataclass
class Schedule:
    n: int
    n_blocks: int
    Smax: int  # max padded block size over sweep levels (accumulator width)
    levels: list  # [LevelPlan] observed levels, root -> leaf order
    pred: LevelPlan | None  # prediction (all-missing) level, or None
    limited_tree: bool


def _pad2(arrs: list[np.ndarray], width: int, fill) -> np.ndarray:
    out = np.full((len(arrs), width), fill, dtype=np.int64)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out


def build_schedule(tree: TreeLevels, limited_tree: bool = False) -> Schedule:
    n = tree.n_rows
    nb = tree.n_blocks

    # group blocks by level, ascending; separate all-empty (prediction) levels
    levels_1b = sorted(set(int(v) for v in tree.block_level))
    sweep_levels: list[LevelPlan] = []
    pred_plan: LevelPlan | None = None

    # per REF sweep level: padded joint layout and its owners
    joint_rows: dict[int, np.ndarray] = {}
    joint_oblk: dict[int, np.ndarray] = {}
    joint_opos: dict[int, np.ndarray] = {}
    block_pos: dict[int, int] = {}  # block id -> position in its level batch
    block_sweep_level: dict[int, int] = {}
    t_sweep = 0

    for li, res in enumerate(levels_1b):
        ids = np.flatnonzero(tree.block_level == res)
        obs = tree.block_ct_obs[ids] > 0
        is_pred_level = not obs.any()
        if not is_pred_level:
            assert obs.all(), f"level {res} mixes observed and empty blocks"
        is_ref = bool(tree.res_is_ref[li] == 1) and not is_pred_level

        row_lists = [tree.block_rows[u] for u in ids]
        S = max(len(r) for r in row_lists)
        rows = _pad2(row_lists, S, n)

        # parent layout
        par_lists = [tree.parents[u] for u in ids]
        has_par = [len(p) > 0 for p in par_lists]
        if not any(has_par):
            prows = np.zeros((len(ids), 0), dtype=np.int64)
            pblock = np.zeros((len(ids), 0), dtype=np.int64)
            ppos = np.zeros((len(ids), 0), dtype=np.int64)
            lp_pos = np.full(len(ids), -1, dtype=np.int64)
            lp_level = -1
        else:
            assert all(has_par), f"level {res} mixes root and non-root blocks"
            lps = np.array([p[-1] for p in par_lists])
            lp_levels = {block_sweep_level[int(b)] for b in lps}
            assert len(lp_levels) == 1, (
                f"level {res}: deepest ancestors at multiple levels {lp_levels}"
            )
            lp_level = lp_levels.pop()
            if limited_tree:
                src_rows = sweep_levels[lp_level].rows
                src_oblk = np.repeat(
                    sweep_levels[lp_level].block_ids[:, None], src_rows.shape[1], 1
                )
                src_oblk = np.where(src_rows < n, src_oblk, nb)
                src_opos = np.repeat(
                    np.arange(src_rows.shape[1])[None, :], src_rows.shape[0], 0
                )
            else:
                src_rows = joint_rows[lp_level]
                src_oblk = joint_oblk[lp_level]
                src_opos = joint_opos[lp_level]
            lp_pos = np.array([block_pos[int(b)] for b in lps])
            prows = src_rows[lp_pos]
            pblock = src_oblk[lp_pos]
            ppos = src_opos[lp_pos]
            # invariant: real parent slots == union of parent block rows
            for i, u in enumerate(ids):
                want = np.sort(np.concatenate([tree.block_rows[p] for p in par_lists[i]]))
                got = np.sort(prows[i][prows[i] < n])
                assert np.array_equal(want, got), f"block {u}: parent layout mismatch"

        plan = LevelPlan(
            res=res, is_ref=is_ref, block_ids=ids, rows=rows, prows=prows,
            lp_pos=lp_pos, lp_level=lp_level, pblock=pblock, ppos=ppos,
        )

        if is_pred_level:
            assert pred_plan is None, "more than one all-empty prediction level"
            pred_plan = plan
            continue

        for i, u in enumerate(ids):
            block_pos[int(u)] = i
            block_sweep_level[int(u)] = t_sweep
        if is_ref:
            jr = np.concatenate([prows, rows], axis=1)
            jo = np.concatenate(
                [pblock, np.where(rows < n, ids[:, None], nb)], axis=1
            )
            jp = np.concatenate(
                [ppos, np.repeat(np.arange(S)[None, :], len(ids), 0)], axis=1
            )
            joint_rows[t_sweep] = jr
            joint_oblk[t_sweep] = jo
            joint_opos[t_sweep] = jp
        sweep_levels.append(plan)
        t_sweep += 1

    Smax = max(p.S for p in sweep_levels)
    return Schedule(
        n=n, n_blocks=nb, Smax=Smax, levels=sweep_levels, pred=pred_plan,
        limited_tree=limited_tree,
    )
