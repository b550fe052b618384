"""Guard the production f32 path against numerical regressions.

All correctness tests run in f64 on CPU, but the TPU production path is f32
with ``jax_default_matmul_precision=float32`` (spamtree_tpu/__init__.py).
Round 1 found that TPU-default bf16 matmul passes make the treed-GP Schur
complements cancel catastrophically and fail Cholesky; these tests pin the
f32 path's accuracy so a regression of that config line (or any future
precision change in sweep/gibbs) fails the suite instead of silently
corrupting chains.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spamtree_tpu.model.core import ModelStatic, quad_loglik, sweep
from spamtree_tpu.model.params import make_theta_spec
from spamtree_tpu.tree.partition import make_tree
from spamtree_tpu.tree.schedule import build_schedule


def _model(dtype, n=600, q=2, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(n // q, 2))
    coords = np.repeat(base, q, axis=0)
    mv = np.tile(np.arange(q), n // q)
    n = len(coords)
    order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
    coords, mv = coords[order], mv[order]
    na = rng.uniform(size=n) > 0.1
    y = rng.normal(size=n)
    y[~na] = np.nan
    X = rng.normal(size=(n, 2))
    tree = make_tree(coords, na, mv, axis_cell_size=4, K=2,
                     rng=np.random.default_rng(seed))
    sched = build_schedule(tree)
    tspec = make_theta_spec(2, q)
    ms = ModelStatic(sched, coords, mv, y, X, tspec.spec, dtype=dtype)
    return ms, tspec


def test_sweep_logdet_f32_matches_f64():
    """The sweep's log-determinant and loglik in f32 must track f64 to a few
    parts in 1e-4 (the level at which bf16 contamination is unmissable: the
    round-1 bf16 bug produced NaN/inf, not small drift)."""
    ms64, tspec = _model(jnp.float64)
    ms32, _ = _model(jnp.float32)

    rng = np.random.default_rng(0)
    w64 = jnp.asarray(np.append(rng.normal(size=ms64.n) * 0.5, 0.0))

    ld64, _, logdet64, ok64 = jax.jit(
        lambda t, w: sweep(ms64, t, w)
    )(jnp.asarray(tspec.start, jnp.float64), w64)
    q64 = quad_loglik(ms64, ld64, w64)

    ld32, _, logdet32, ok32 = jax.jit(
        lambda t, w: sweep(ms32, t, w)
    )(jnp.asarray(tspec.start, jnp.float32), w64.astype(jnp.float32))
    q32 = quad_loglik(ms32, ld32, w64.astype(jnp.float32))

    assert bool(ok64) and bool(ok32), "sweep must succeed in both precisions"
    ld_err = abs(float(logdet32) - float(logdet64)) / max(abs(float(logdet64)), 1.0)
    q_err = abs(float(q32) - float(q64)) / max(abs(float(q64)), 1.0)
    assert ld_err < 5e-4, f"f32 logdet drift {ld_err:.2e}"
    assert q_err < 5e-3, f"f32 quadratic-form drift {q_err:.2e}"


def test_matmul_precision_config_is_set():
    """Importing the package must pin full-precision f32 matmuls; TPU bf16
    default breaks the Schur-complement Cholesky (round-1 finding)."""
    import spamtree_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "float32"


def test_bf16_factor_storage_tracks_f32():
    """factor_dtype="bfloat16" stores the propagated joint factors in bf16
    (storage-only; Schur/chol/accumulation stay f32).  The induced model
    perturbation must be small: logdet/quad drift bounded, chol still ok,
    and the per-level H operators close in a relative sense.  This is the
    tolerance gate required before the flag is usable in production
    (round-2 VERDICT item 6)."""
    from spamtree_tpu.model.core import gibbs_w

    def _model_fd(factor_dtype):
        rng = np.random.default_rng(5)
        n, q = 600, 2
        base = rng.uniform(size=(n // q, 2))
        coords = np.repeat(base, q, axis=0)
        mv = np.tile(np.arange(q), n // q)
        n = len(coords)
        order = np.lexsort((np.arange(n), coords[:, 1], coords[:, 0]))
        coords, mv = coords[order], mv[order]
        na = rng.uniform(size=n) > 0.1
        y = rng.normal(size=n)
        y[~na] = np.nan
        X = rng.normal(size=(n, 2))
        tree = make_tree(coords, na, mv, axis_cell_size=4, K=2,
                         rng=np.random.default_rng(5))
        sched = build_schedule(tree)
        tspec = make_theta_spec(2, 2)
        return ModelStatic(sched, coords, mv, y, X, tspec.spec,
                           dtype=jnp.float32, factor_dtype=factor_dtype), tspec

    ms32, tspec = _model_fd(None)
    msbf, _ = _model_fd("bfloat16")

    rng = np.random.default_rng(0)
    w = jnp.asarray(np.append(rng.normal(size=ms32.n) * 0.5, 0.0),
                    jnp.float32)
    th = jnp.asarray(tspec.start, jnp.float32)

    ld32, _, logdet32, ok32 = jax.jit(lambda t, ww: sweep(ms32, t, ww))(th, w)
    ldbf, _, logdetbf, okbf = jax.jit(lambda t, ww: sweep(msbf, t, ww))(th, w)
    assert bool(ok32) and bool(okbf), "bf16 factor storage must not break chol"

    ld_err = abs(float(logdetbf) - float(logdet32)) / max(
        abs(float(logdet32)), 1.0
    )
    assert ld_err < 2e-3, f"bf16-factor logdet drift {ld_err:.2e}"
    q32 = float(quad_loglik(ms32, ld32, w))
    qbf = float(quad_loglik(msbf, ldbf, w))
    assert abs(qbf - q32) / max(abs(q32), 1.0) < 2e-2, (q32, qbf)

    # per-level conditional-mean operators stay close (scaled by the
    # level's own magnitude: H entries are O(1))
    for a, b in zip(ld32, ldbf):
        if a.H.size == 0:  # root level: no parents, no conditional-mean map
            continue
        scale = float(jnp.max(jnp.abs(a.H))) or 1.0
        rel = float(jnp.max(jnp.abs(a.H - b.H))) / scale
        assert rel < 5e-2, rel

    # the w-Gibbs draw from the perturbed factors stays close for the same
    # RNG key (same distributional family, slightly perturbed conditionals)
    key = jax.random.PRNGKey(3)
    ti = jnp.asarray([4.0, 4.0], jnp.float32)
    XB = jnp.zeros((ms32.n + 1,), jnp.float32)
    w1 = np.asarray(gibbs_w(ms32, ld32, w, ti, XB, key))
    w2 = np.asarray(gibbs_w(msbf, ldbf, w, ti, XB, key))
    denom = max(float(np.std(w1)), 1e-3)
    assert float(np.abs(w1 - w2).max()) / denom < 0.2, (
        np.abs(w1 - w2).max(), denom
    )
