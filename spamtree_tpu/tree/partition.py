"""Host-side recursive axis-parallel tree partitioner (NumPy).

Builds the treed DAG over blocks of locations, reproducing the structure of
the reference's R/C++ partitioner:

* quantile thresholds        (reference: src/tree_dep.cpp:16-27 ``kthresholds``)
* axis-parallel binning      (reference: src/tree_dep.cpp:42-67, R/axis_parallel.R)
* knot cherry-picking loop   (reference: R/make_tree.R:62-154)
* leftover / missing levels  (reference: R/make_tree.R:213-413, 1-NN via kd-tree)
* DAG edges                  (reference: src/tree_dep.cpp:75-186 ``make_edges[_limited]``)

Because the per-level quantile grids are nested (cut positions i*n/K^(r-1)
are a subset of the level-(r) positions), every block has a complete chain of
ancestors, one per earlier branching level; parents are defined as the finite
*reference* ancestors of that chain (full tree) or only the deepest one
(limited tree), exactly as ``make_edges``/``make_edges_limited`` compute them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from scipy.spatial import cKDTree


def kthresholds(x: np.ndarray, k: int) -> np.ndarray:
    """k-quantile cut points: sorted(x)[i*n//k], i=1..k-1 (tree_dep.cpp:16-27).

    Dispatches to the native C++ kernel (nth_element-based, like the
    reference) when native/libspamtree_host.so is available."""
    from spamtree_tpu.utils import native

    return native.kthresholds(np.asarray(x, dtype=np.float64), k)


def column_threshold(col: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """1 + #{t : col >= t} per entry (tree_dep.cpp:42-55)."""
    from spamtree_tpu.utils import native

    return native.column_threshold(
        np.asarray(col, dtype=np.float64), np.asarray(thresholds, dtype=np.float64)
    )


def axis_bins(coords: np.ndarray, thresholds: list[np.ndarray]) -> np.ndarray:
    """(n, dd) per-axis interval indices (part_axis_parallel_lmt, tree_dep.cpp:58-67)."""
    out = np.empty(coords.shape, dtype=np.int64)
    for j in range(coords.shape[1]):
        out[:, j] = column_threshold(coords[:, j], thresholds[j])
    return out


def combined_cell_id(bins: np.ndarray, strides: np.ndarray) -> np.ndarray:
    """Injective scalar cell key from per-axis interval indices."""
    return bins @ strides


def _group_rows(keys: np.ndarray):
    """(order, starts): stable grouping by ascending key.

    Native C++ stable_sort when available (the R reference does this with
    group_by/split, make_tree.R; at n ~ 1e6 the host grouping passes are a
    real setup cost)."""
    from spamtree_tpu.utils import native

    return native.group_by_key(np.asarray(keys, dtype=np.int64))


@dataclass
class TreeLevels:
    """Partition output: flat per-row assignment plus per-block structure."""

    n_rows: int
    block_of_row: np.ndarray  # (n,) int, 0-based block id (-1 never happens)
    res_of_row: np.ndarray  # (n,) int, 1-based level
    res_is_ref: np.ndarray  # (L,) int 0/1 per level
    n_levels: int
    n_blocks: int
    block_rows: list  # [n_blocks] arrays of row indices
    block_level: np.ndarray  # (n_blocks,) 1-based level of each block
    parents: list  # [n_blocks] int arrays, ref-ancestor block ids (ascending level)
    block_ct_obs: np.ndarray  # (n_blocks,) observed-row counts


def make_tree(
    coords: np.ndarray,
    na_which: np.ndarray,
    mv_id: np.ndarray,
    axis_cell_size,
    K,
    start_level: int = 0,
    tree_depth: float = np.inf,
    last_not_reference: bool = True,
    limited_tree: bool = False,
    cherrypick_same_margin: bool = True,
    cherrypick_group_locations: bool = True,
    mvbias: float = 0.0,
    rng: np.random.Generator | None = None,
    verbose: bool = False,
) -> TreeLevels:
    """Build the treed partition (reference: R/make_tree.R:1-420).

    ``coords`` (n, dd); ``na_which`` boolean observed mask; ``mv_id`` 0-based
    margin ids.  Returns block assignments + DAG parents.
    """
    if rng is None:
        rng = np.random.default_rng(0)
    n, dd = coords.shape
    axis_cell_size = np.broadcast_to(np.asarray(axis_cell_size, dtype=np.int64), (dd,))
    K = np.broadcast_to(np.asarray(K, dtype=np.int64), (dd,))
    observed = np.asarray(na_which, dtype=bool)
    mv_id = np.asarray(mv_id, dtype=np.int64)
    q = int(mv_id.max()) + 1 if n else 1

    # margin weights for knot cherry-picking (make_tree.R:13-22)
    counts = np.bincount(mv_id[observed], minlength=q).astype(np.float64)
    counts = np.maximum(counts, 1.0)
    w_margin = counts ** (-mvbias)
    w_margin = w_margin / w_margin.sum()

    avail = np.flatnonzero(observed)
    missing = np.flatnonzero(~observed)
    cavail = coords[avail]

    max_res = start_level + tree_depth

    block_of_row = np.full(n, -1, dtype=np.int64)
    res_of_row = np.full(n, -1, dtype=np.int64)

    # per available row, coarse-cell key at each branching level
    lev_cells: list[np.ndarray] = []  # each (n_avail,) int64 keys
    cell2block: list[dict] = []  # per level: cell key -> block id
    block_rows: list[np.ndarray] = []
    block_level_list: list[int] = []
    res_is_ref_list: list[int] = []

    in_pool = np.ones(len(avail), dtype=bool)  # rows of `avail` still unassigned
    max_block_number = 0
    res = start_level + 1
    n_branch_levels = 0

    # coordinate-duplicate groups for cherrypick_group_locations
    _, coord_gid_avail = np.unique(cavail, axis=0, return_inverse=True)

    while res <= max_res and in_pool.any():
        r_ix = n_branch_levels  # 0-based level index
        fine_thr = [kthresholds(cavail[:, i], int(axis_cell_size[i] * K[i] ** (res - 1))) for i in range(dd)]
        grid_size = int(np.prod([len(t) + 1 for t in fine_thr]))
        pool_idx = np.flatnonzero(in_pool)

        if grid_size < pool_idx.size:
            # bin the pool into fine cells, pick 1 knot per cell with margin weights
            fb = axis_bins(cavail[pool_idx], fine_thr)
            strides = np.cumprod([1] + [len(t) + 2 for t in fine_thr[:-1]])
            fkey = combined_cell_id(fb, np.asarray(strides))
            w = w_margin[mv_id[avail[pool_idx]]]
            gumbel = rng.gumbel(size=pool_idx.size)
            score = np.log(np.maximum(w, 1e-300)) + gumbel
            order = np.lexsort((-score, fkey))
            fsorted = fkey[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = fsorted[1:] != fsorted[:-1]
            knots_local = pool_idx[order[first]]
            if cherrypick_group_locations:
                sel_gids = np.zeros(coord_gid_avail.max() + 1, dtype=bool)
                sel_gids[coord_gid_avail[knots_local]] = True
                knots_local = pool_idx[sel_gids[coord_gid_avail[pool_idx]]]
        else:
            knots_local = pool_idx

        # coarse blocks at this level (make_tree.R:118-125)
        coarse_thr = [kthresholds(cavail[:, i], int(K[i] ** (res - 1))) for i in range(dd)]
        cb_all = axis_bins(cavail, coarse_thr)
        strides = np.asarray(np.cumprod([1] + [len(t) + 2 for t in coarse_thr[:-1]]))
        ckey_all = combined_cell_id(cb_all, strides)
        lev_cells.append(ckey_all)

        knot_keys = ckey_all[knots_local]
        order2, starts = _group_rows(knot_keys)
        uniq_keys = knot_keys[order2[starts[:-1]]]
        c2b = {int(k): max_block_number + j for j, k in enumerate(uniq_keys)}
        cell2block.append(c2b)
        for j in range(len(uniq_keys)):
            grp = knots_local[order2[starts[j] : starts[j + 1]]]
            rows_j = avail[grp]
            block_rows.append(rows_j)
            block_level_list.append(res)
            block_of_row[rows_j] = max_block_number + j
            res_of_row[rows_j] = res
        max_block_number += len(uniq_keys)
        res_is_ref_list.append(1)

        in_pool[knots_local] = False
        n_branch_levels += 1
        res += 1

    # last branching level may be demoted to non-reference (make_tree.R:162-165)
    if last_not_reference and res < max_res and n_branch_levels > 0:
        res_is_ref_list[-1] = 0

    ref_levels = [g for g in range(n_branch_levels) if res_is_ref_list[g] == 1]

    def _chain_parents(host_block: int, include_host: bool) -> np.ndarray:
        """Reference ancestors of a block's chain (make_edges parent rule)."""
        r0 = block_rows[host_block][0]
        a0 = np.searchsorted(avail, r0)  # host rows are available rows
        host_lev = block_level_list[host_block] - (start_level + 1)  # 0-based branch level
        out = []
        levs = ref_levels if not limited_tree else ref_levels
        for g in levs:
            if g < host_lev:
                key = int(lev_cells[g][a0])
                b = cell2block[g].get(key)
                if b is not None:
                    out.append(b)
        if include_host and res_is_ref_list[host_lev] == 1:
            out.append(host_block)
        if limited_tree and out:
            out = [out[-1]]
        return np.asarray(out, dtype=np.int64)

    parents: list[np.ndarray] = []
    for u in range(max_block_number):
        parents.append(_chain_parents(u, include_host=False))

    # ---- leftover observed rows -> 1-NN extra non-reference level ----
    # (make_tree.R:213-305)
    def _host_blocks_for(points: np.ndarray, pt_mv: np.ndarray, target_rows: np.ndarray):
        """1-NN host block for each point among target_rows (kd-tree)."""
        host = np.empty(len(points), dtype=np.int64)
        if cherrypick_same_margin:
            for vv in np.unique(pt_mv):
                mask_p = pt_mv == vv
                tmask = mv_id[target_rows] == vv
                tr = target_rows[tmask] if tmask.any() else target_rows
                tree = cKDTree(coords[tr])
                _, nn = tree.query(points[mask_p], k=1)
                host[mask_p] = block_of_row[tr[nn]]
        else:
            tree = cKDTree(coords[target_rows])
            _, nn = tree.query(points, k=1)
            host[:] = block_of_row[target_rows[nn]]
        return host

    max_branch_res = (start_level + n_branch_levels) if n_branch_levels else start_level

    if in_pool.any():
        left_rows = avail[in_pool]
        deepest_rows = np.concatenate(
            [block_rows[u] for u in range(max_block_number)
             if block_level_list[u] == max_branch_res]
        )
        host = _host_blocks_for(coords[left_rows], mv_id[left_rows], deepest_rows)
        res_left = max_branch_res + 1
        order2, starts = _group_rows(host)
        uniq_hosts = host[order2[starts[:-1]]]
        for j in range(len(uniq_hosts)):
            rows_j = left_rows[order2[starts[j] : starts[j + 1]]]
            u = max_block_number + j
            block_rows.append(rows_j)
            block_level_list.append(res_left)
            block_of_row[rows_j] = u
            res_of_row[rows_j] = res_left
            parents.append(_chain_parents(int(uniq_hosts[j]), include_host=True))
        max_block_number += len(uniq_hosts)
        res_is_ref_list.append(0)
        has_leftover = True
    else:
        has_leftover = False

    if len(res_is_ref_list) == 1:
        res_is_ref_list = [1]

    # ---- missing rows -> final prediction level ---- (make_tree.R:317-413)
    if missing.size:
        # hosts come from the deepest *branching* (refset) level, not leftover
        deepest_rows = np.concatenate(
            [block_rows[u] for u in range(len(block_rows))
             if block_level_list[u] == max_branch_res]
        )
        host = _host_blocks_for(coords[missing], mv_id[missing], deepest_rows)
        res_miss = (max_branch_res + 2) if has_leftover else (max_branch_res + 1)
        order2, starts = _group_rows(host)
        uniq_hosts = host[order2[starts[:-1]]]
        for j in range(len(uniq_hosts)):
            rows_j = missing[order2[starts[j] : starts[j + 1]]]
            u = max_block_number + j
            block_rows.append(rows_j)
            block_level_list.append(res_miss)
            block_of_row[rows_j] = u
            res_of_row[rows_j] = res_miss
            parents.append(_chain_parents(int(uniq_hosts[j]), include_host=True))
        max_block_number += len(uniq_hosts)
        res_is_ref_list.append(0)

    n_blocks = max_block_number
    block_ct_obs = np.array(
        [int(observed[r].sum()) for r in block_rows], dtype=np.int64
    )

    # structural invariant: no block shares a level with any of its parents
    # (the Gibbs-group coloring check, reference: spamtree_model.cpp:201-226)
    blk_lev = np.asarray(block_level_list)
    for u in range(n_blocks):
        if parents[u].size:
            assert np.all(blk_lev[parents[u]] < blk_lev[u]), (
                f"block {u}: parent at same/deeper level"
            )

    return TreeLevels(
        n_rows=n,
        block_of_row=block_of_row,
        res_of_row=res_of_row,
        res_is_ref=np.asarray(res_is_ref_list, dtype=np.int64),
        n_levels=len(res_is_ref_list),
        n_blocks=n_blocks,
        block_rows=block_rows,
        block_level=blk_lev,
        parents=parents,
        block_ct_obs=block_ct_obs,
    )
