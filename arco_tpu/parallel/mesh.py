"""Device mesh and sharding helpers.

The reference's only parallelism is single-process torch DataParallel
(model_2D.py:187-198) — replicate + scatter/gather per call. Here the whole
train step is jitted once with NamedSharding constraints: batch-sharded data
over the 'data' mesh axis, replicated parameters/queues; XLA inserts psum for
gradients and all_gathers where queue updates need global keys — the
collectives ride ICI with zero hand-written communication code (SURVEY §2.9).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("data",),
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None or tuple(shape) == (-1,):
        shape = (n,)
    shape = tuple(int(s) if s != -1 else n // int(np.prod(
        [x for x in shape if x != -1]) or 1) for s in shape)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
