"""spamtree_tpu: TPU-native Bayesian multivariate spatial regression with
Spatial Multivariate Trees (SpamTrees, Peruzzi & Dunson 2021).

A from-scratch JAX/XLA reimplementation of the capabilities of the CRAN
``spamtree`` package: treed-DAG Gaussian processes fit by level-synchronous
blocked Gibbs + adaptive Metropolis, designed for TPU (batched padded block
kernels, single-jit MCMC scan, device RNG, mesh sharding over the block axis).
"""

from spamtree_tpu.api import spamtree
from spamtree_tpu.ops.covariance import cross_covariance_ag10 as CrossCovarianceAG10
from spamtree_tpu.utils.summaries import list_mean, list_qtile

__all__ = ["spamtree", "CrossCovarianceAG10", "list_mean", "list_qtile"]
__version__ = "0.1.0"
