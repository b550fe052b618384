"""spamtree_tpu: TPU-native Bayesian multivariate spatial regression with
Spatial Multivariate Trees (SpamTrees, Peruzzi & Dunson 2021).

A from-scratch JAX/XLA reimplementation of the capabilities of the CRAN
``spamtree`` package: treed-DAG Gaussian processes fit by level-synchronous
blocked Gibbs + adaptive Metropolis, designed for TPU (batched padded block
kernels, single-jit MCMC scan, device RNG, mesh sharding over the block axis).
"""

import os as _os

import jax as _jax

# TPU f32 matmuls default to bf16 passes; the treed-GP Schur complements
# (Kcc - M'M with strongly correlated parents) cancel catastrophically at
# bf16 and fail Cholesky.  Full-precision f32 matmuls throughout.
_jax.config.update("jax_default_matmul_precision", "float32")

# persistent XLA compilation cache: TPU compiles of the full MCMC program are
# minutes-long; caching makes repeated runs (same shapes) start instantly.
if not _os.environ.get("SPAMTREE_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "SPAMTREE_COMPILE_CACHE", _os.path.expanduser("~/.cache/spamtree_tpu_xla")
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from spamtree_tpu.api import spamtree, spamtree_predict
from spamtree_tpu.model.transforms import transf_back as par_huvtransf_back
from spamtree_tpu.model.transforms import transf_fwd as par_huvtransf_fwd
from spamtree_tpu.ops.covariance import cross_covariance_ag10 as CrossCovarianceAG10
from spamtree_tpu.ops.covariance import vec_to_symmat
from spamtree_tpu.tree.partition import axis_bins, kthresholds, make_tree
from spamtree_tpu.utils.fitio import load_fit, save_fit
from spamtree_tpu.utils.summaries import (
    ess,
    find_nan,
    find_not_nan,
    list_cubes_mean,
    list_mean,
    list_qtile,
    rhat,
    summarize_fit,
)

__all__ = [
    "spamtree", "spamtree_predict", "CrossCovarianceAG10", "list_mean", "list_qtile",
    "list_cubes_mean", "find_nan", "find_not_nan", "vec_to_symmat",
    "par_huvtransf_fwd", "par_huvtransf_back", "kthresholds", "axis_bins",
    "make_tree", "rhat", "ess", "save_fit", "load_fit", "summarize_fit",
]
__version__ = "0.1.0"
