"""Device mesh + data-parallel sharding utilities.

The reference is single-process/single-device (``test.py:155`` picks one
cuda/cpu device; ``torch.distributed`` is never imported — SURVEY.md §2.4).
The TPU build scales data-parallel over an ICI mesh: batches are sharded on
a ``data`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce automatically when the jitted train step consumes sharded inputs
(jit + NamedSharding SPMD partitioning — no hand-written collectives
needed at this model scale; the mesh API leaves room for a ``model`` axis).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_specs"]


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def data_parallel_specs(mesh: Mesh, axis_name: str = "data"):
    """(batch_sharding, replicated_sharding) for the mesh."""
    return (NamedSharding(mesh, P(axis_name)),
            NamedSharding(mesh, P()))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every leaf of a batch pytree along its leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters/optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
