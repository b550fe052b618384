"""Partitioner and schedule structural-invariant tests
(the reference's coloring/indexing checks, spamtree_model.cpp:194-420)."""

import numpy as np

from spamtree_tpu.tree.partition import axis_bins, kthresholds, make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _toy(n=400, miss=0.1, q=1, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    mv = rng.integers(0, q, n)
    na = rng.uniform(size=n) > miss
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    return coords[order], na[order], mv[order]


def test_kthresholds():
    x = np.arange(100, dtype=float)
    t = kthresholds(x, 4)
    assert len(t) == 3
    np.testing.assert_allclose(t, [25, 50, 75])


def test_axis_bins():
    c = np.array([[0.1], [0.5], [0.9]])
    b = axis_bins(c, [np.array([0.3, 0.6])])
    np.testing.assert_array_equal(b[:, 0], [1, 2, 3])


def test_make_tree_invariants():
    coords, na, mv = _toy()
    tree = make_tree(coords, na, mv, axis_cell_size=5, K=2)
    n = len(coords)
    # every row assigned exactly once
    assert np.all(tree.block_of_row >= 0)
    assert np.all(tree.res_of_row >= 1)
    total = sum(len(r) for r in tree.block_rows)
    assert total == n
    seen = np.concatenate(tree.block_rows)
    assert len(np.unique(seen)) == n
    # missing rows live in zero-observed blocks, observed rows in positive ones
    for u, rows in enumerate(tree.block_rows):
        obs_u = na[rows].sum()
        assert obs_u == tree.block_ct_obs[u]
        assert obs_u == 0 or obs_u == len(rows)
    # parents strictly shallower, chains complete over ref levels
    for u in range(tree.n_blocks):
        lv = tree.block_level[u]
        plv = tree.block_level[tree.parents[u]]
        assert np.all(np.diff(plv) > 0)
        assert np.all(plv < lv)
    # res_is_ref: branching levels ref (except possibly last), tail levels not
    assert tree.res_is_ref[0] == 1


def test_make_tree_no_missing():
    coords, na, mv = _toy(miss=0.0)
    na[:] = True
    tree = make_tree(coords, na, mv, axis_cell_size=5, K=2)
    assert np.all(tree.block_ct_obs > 0)
    sched = build_schedule(tree)
    assert sched.pred is None


def test_schedule_layout():
    coords, na, mv = _toy()
    tree = make_tree(coords, na, mv, axis_cell_size=5, K=2)
    sched = build_schedule(tree)  # internal asserts check parent layouts
    n = tree.n_rows
    # sweep covers exactly the observed rows
    rows = np.concatenate([p.rows[p.rows < n] for p in sched.levels])
    assert len(np.unique(rows)) == len(rows) == int(na.sum())
    # prediction level covers the missing rows
    if sched.pred is not None:
        prow = sched.pred.rows[sched.pred.rows < n]
        assert len(prow) == int((~na).sum())
    # segment consistency: ancestor a's rows fill layout slice [off, off+size)
    for p in sched.levels + ([sched.pred] if sched.pred is not None else []):
        assert p.anc_blocks.shape[1] == len(p.seg_off) == len(p.seg_size)
        for i in range(p.B):
            for a, (o, s) in enumerate(zip(p.seg_off, p.seg_size)):
                if p.anc_blocks[i, a] >= tree.n_blocks:
                    continue  # dummy/empty slot (group padding or alignment)
                rows_a = tree.block_rows[p.anc_blocks[i, a]]
                seg = p.prows[i, o : o + s]
                assert np.array_equal(seg[: len(rows_a)], rows_a)
                assert np.all(seg[len(rows_a):] == n)


def test_multivariate_tree():
    rng = np.random.default_rng(5)
    n = 600
    coords = np.repeat(rng.uniform(size=(n // 2, 2)), 2, axis=0)
    mv = np.tile([0, 1], n // 2)
    na = rng.uniform(size=n) > 0.1
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    tree = make_tree(coords[order], na[order], mv[order], axis_cell_size=5, K=2)
    sched = build_schedule(tree)
    assert tree.n_blocks == len(tree.block_rows)
    assert len(sched.levels) >= 2


def test_start_level_and_vector_K():
    """start_level>0 roots the tree at a finer resolution; K may differ per
    axis (reference: make_tree.R args, spamtree_fit.R:4-5)."""
    coords, na, mv = _toy(n=500)
    tree = make_tree(coords, na, mv, axis_cell_size=[4, 5], K=[2, 3],
                     start_level=1, tree_depth=3)
    sched = build_schedule(tree)
    # first level has multiple root blocks (K1*K2 cells at res 2)
    assert sched.levels[0].P == 0
    assert sched.levels[0].B > 1
    total = sum(len(r) for r in tree.block_rows)
    assert total == len(coords)


def test_mvbias_prefers_sparse_margin():
    """mvbias>0 weights knot picking toward the sparser margin
    (reference: make_tree.R:8-22)."""
    rng = np.random.default_rng(7)
    n = 800
    coords = rng.uniform(size=(n, 2))
    mv = (rng.uniform(size=n) < 0.2).astype(np.int64)  # margin 1 sparse
    na = np.ones(n, dtype=bool)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    t0 = make_tree(coords, na, mv, axis_cell_size=3, K=2, mvbias=0.0,
                   rng=np.random.default_rng(1))
    t2 = make_tree(coords, na, mv, axis_cell_size=3, K=2, mvbias=2.0,
                   rng=np.random.default_rng(1))

    def frac_sparse_at_top(tree, lev=2):
        rows = np.concatenate(
            [tree.block_rows[u] for u in range(tree.n_blocks)
             if tree.block_level[u] <= lev]
        )
        return mv[rows].mean()

    assert frac_sparse_at_top(t2) > frac_sparse_at_top(t0)


def test_limited_tree():
    coords, na, mv = _toy()
    tree = make_tree(coords, na, mv, axis_cell_size=5, K=2, limited_tree=True)
    for u in range(tree.n_blocks):
        assert len(tree.parents[u]) <= 1
    sched = build_schedule(tree, limited_tree=True)
    assert sched.levels


def test_fuzz_tree_schedule_invariants():
    """Randomized knob sweep: every (n, q, dd, K, cell_size, start_level,
    tree_depth, limited, miss, mvbias) draw must build a tree and schedule
    whose internal invariants hold (the schedule's layout asserts and the
    partitioner's coloring assert run on construction -- the reference
    hard-fails the same way in make_gibbs_groups, spamtree_model.cpp:201-226)
    and whose blocks exactly cover the rows."""
    rng = np.random.default_rng(2026)
    for trial in range(80):
        n = int(rng.integers(60, 700))
        q = int(rng.integers(1, 4))
        dd = int(rng.integers(2, 4))
        coords = rng.uniform(size=(n, dd))
        mv = rng.integers(0, q, n)
        miss = float(rng.choice([0.0, 0.1, 0.3]))
        na = rng.uniform(size=n) > miss
        if not na.any():  # all-missing is rejected upstream by the API
            na[rng.integers(0, n)] = True
        order = np.lexsort((np.arange(n),) + tuple(
            coords[:, d] for d in reversed(range(dd))))
        coords, na, mv = coords[order], na[order], mv[order]
        kw = dict(
            axis_cell_size=int(rng.integers(2, 8)),
            K=int(rng.integers(2, 4)),
            limited_tree=bool(rng.integers(0, 2)),
            mvbias=float(rng.choice([0.0, 1.0])),
            rng=np.random.default_rng(int(rng.integers(1 << 30))),
        )
        if rng.integers(0, 2):
            kw["tree_depth"] = int(rng.integers(2, 5))
        try:
            tree = make_tree(coords, na, mv, **kw)
            sched = build_schedule(tree, limited_tree=kw["limited_tree"])
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"trial {trial} failed with {kw}: {e}")
        # exact row coverage, each row in exactly one block
        seen = np.concatenate([tree.block_rows[u]
                               for u in range(tree.n_blocks)
                               if len(tree.block_rows[u])])
        assert len(seen) == n and len(np.unique(seen)) == n, (trial, kw)
        # sweep levels cover the observed rows exactly once; the prediction
        # level covers the missing rows exactly once
        lv_rows = [lvl.rows[lvl.rows < n].ravel() for lvl in sched.levels]
        flat = np.concatenate([r for r in lv_rows if r.size])
        assert len(flat) == int(na.sum()), (trial, kw)
        assert len(np.unique(flat)) == len(flat), (trial, kw)
        if sched.pred is not None:
            prow = sched.pred.rows[sched.pred.rows < n].ravel()
            assert len(prow) == int((~na).sum()), (trial, kw)
            assert len(np.unique(prow)) == len(prow), (trial, kw)
        else:
            assert na.all(), (trial, kw)
        # limited tree: at most one parent block per block
        if kw["limited_tree"]:
            assert all(len(p) <= 1 for p in tree.parents), (trial, kw)
