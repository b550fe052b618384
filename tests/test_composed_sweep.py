"""Parity gate for the parts-composed decision sweep (core._apply_parts_thin).

In decision mode a reference level whose only sweep consumers are aligned
thin levels emits factor PARTS (LAi, H, Rinv) instead of assembling the
joint J = [[LAi, 0], [-Rinv H, Rinv]]; the thin child applies them
block-structured.  Semantics source: the nested-ancestor factor update
``invchol_block_inplace_direct`` (reference: src/spamtree_model.cpp:900-907)
whose assembled product this composition reproduces without materializing.

``align_min_p=1`` forces parent alignment at test scale so the composed
branch actually activates (asserted).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spamtree_tpu.model.core import ModelStatic, _compose_children, sweep
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _aligned_model():
    rng = np.random.default_rng(11)
    q = 2
    base = rng.uniform(size=(400, 2))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), 400)
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    na = rng.uniform(size=n) > 0.1
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = rng.normal(size=(n, 2))
    tree = make_tree(coords, na, mv, axis_cell_size=4, K=2, rng=rng)
    sched = build_schedule(tree, align_min_p=1)
    tspec = make_theta_spec(2, q)
    ms = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=jnp.float64)
    eligible = [t for t in range(len(ms.levels))
                if ms.level_is_ref[t] and _compose_children(ms, t)]
    assert eligible, "composed branch must activate in this test model"
    return ms, tspec, rng


def test_composed_decision_parity(monkeypatch):
    monkeypatch.setenv("SPAMTREE_LEVEL_KERNELS", "0")
    ms, tspec, rng = _aligned_model()
    theta = jnp.asarray(tspec.start, jnp.float64)
    w = jnp.asarray(np.append(rng.normal(size=ms.n) * 0.4, 0.0))
    ld, _, _, ok0 = jax.jit(lambda t: sweep(ms, t, w))(theta)
    assert bool(ok0)
    prop = theta * 1.1 + 0.02

    monkeypatch.setenv("SPAMTREE_COMPOSED_FACTORS", "1")
    r_on = jax.jit(lambda t: sweep(ms, t, w, quad_prev=ld,
                                   decision_only=True))(prop)
    monkeypatch.setenv("SPAMTREE_COMPOSED_FACTORS", "0")
    r_off = jax.jit(lambda t: sweep(ms, t, w, quad_prev=ld,
                                    decision_only=True))(prop)
    assert bool(r_on[1]) == bool(r_off[1])
    for a, b in zip((r_on[0], r_on[2], r_on[3]),
                    (r_off[0], r_off[2], r_off[3])):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-11)


def test_composed_matches_assembled_joint_directly():
    """_apply_parts_thin == (J @ Kxc)-derived quantities for an explicitly
    assembled J, including the grouped-parent (gc_p > 1) layout."""
    from spamtree_tpu.model.core import _apply_parts_thin

    rng = np.random.default_rng(2)
    f = jnp.float64
    B, gc_p, Pp, Sp, S = 8, 4, 7, 5, 6
    G = B // gc_p
    P = Pp + Sp
    LAi = jnp.asarray(rng.normal(size=(G, Pp, Pp)), f)
    H = jnp.asarray(rng.normal(size=(B, Sp, Pp)), f)
    Rinv = jnp.asarray(np.tril(rng.normal(size=(B, Sp, Sp))), f)
    Kxc = jnp.asarray(rng.normal(size=(B, P, S)), f)
    wpar = jnp.asarray(rng.normal(size=(B, P)), f)

    hk, hw = _apply_parts_thin((LAi, H, Rinv, gc_p), Kxc, wpar, f)

    LAi_b = jnp.repeat(LAi, gc_p, axis=0)  # (B, Pp, Pp)
    top = jnp.concatenate(
        [LAi_b, jnp.zeros((B, Pp, Sp), dtype=f)], axis=2)
    bot = jnp.concatenate(
        [-jnp.einsum("bst,btp->bsp", Rinv, H), Rinv], axis=2)
    J = jnp.concatenate([top, bot], axis=1)  # (B, P, P)
    M = J @ Kxc
    np.testing.assert_allclose(
        np.asarray(hk), np.asarray(jnp.sum(M * M, axis=1)), rtol=1e-12)
    hw_ref = jnp.einsum("bps,bp->bs", M, jnp.einsum("bpq,bq->bp", J, wpar))
    np.testing.assert_allclose(np.asarray(hw), np.asarray(hw_ref),
                               rtol=1e-11, atol=1e-12)
