"""Device-mesh sharding for SpamTree MCMC.

The reference's only parallelism is OpenMP threads over blocks within a tree
level (reference: spamtree_model.cpp:849-852, spamtree_fit.cpp:57-59).  The
TPU-native equivalents here:

* ``blocks`` mesh axis: every per-level batch (rows/prows/masks and all the
  derived (B, ...) tensors) is sharded along the block-batch dimension; XLA
  GSPMD inserts the collectives for the child->parent scatter-add messages
  (which ride ICI).  This is the analog of the within-level OpenMP fan-out.
* ``chains`` mesh axis: independent MCMC chains vmapped and sharded -- pure
  data parallelism the reference cannot do at all.

Global row-indexed state (w, coords, y, XB: a few MB even at n=1e6) is
replicated; only the O(B * S * P) level tensors are sharded.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spamtree_tpu.model.core import LevelArrays, ModelStatic


def make_mesh(n_chains: int = 1, n_blocks_shards: int | None = None,
              devices=None) -> Mesh:
    devs = np.array(jax.devices() if devices is None else list(devices))
    total = len(devs)
    if n_blocks_shards is None:
        n_blocks_shards = total // n_chains
    assert n_chains * n_blocks_shards == total, (
        f"{n_chains} x {n_blocks_shards} != {total} devices"
    )
    return Mesh(devs.reshape(n_chains, n_blocks_shards), ("chains", "blocks"))


def shard_model(ms: ModelStatic, mesh: Mesh) -> ModelStatic:
    """Place level batches block-sharded and global arrays replicated."""
    # host-staged models ship in one packed transfer first; the resharding
    # below is then device->device instead of one slow host put per leaf
    ms.materialize_device()
    blk = NamedSharding(mesh, P("blocks"))
    rep = NamedSharding(mesh, P())

    def _shard_level(lvl: LevelArrays) -> LevelArrays:
        return LevelArrays(*[jax.device_put(a, blk) for a in lvl])

    ms.levels = [_shard_level(l) for l in ms.levels]
    if ms.pred_arrays is not None:
        ms.pred_arrays = [_shard_level(p) for p in ms.pred_arrays]
    for name in ("coords", "mv", "y", "X", "obs_mask", "mv_onehot_obs",
                 "mv_onehot", "XtX"):
        setattr(ms, name, jax.device_put(getattr(ms, name), rep))
    return ms


def replicated(mesh: Mesh, tree):
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)


def chain_sharded(mesh: Mesh, tree):
    """Shard a per-chain-stacked pytree along the chains mesh axis."""
    sh = NamedSharding(mesh, P("chains"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
