"""Device mesh + sharding utilities (data parallel + optional tensor
parallel).

The reference is single-process/single-device (``test.py:155`` picks one
cuda/cpu device; ``torch.distributed`` is never imported — SURVEY.md §2.4).
The TPU build scales data-parallel over an ICI mesh: batches are sharded on
a ``data`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce automatically when the jitted train step consumes sharded inputs
(jit + NamedSharding SPMD partitioning — no hand-written collectives).

A ``model`` axis is also supported: at <40M params TP is not *needed*
(SURVEY §2.4), but the hybrid's CNN fc1 (33.5M params, 128*nbits x 256)
is large enough to shard meaningfully — :func:`param_shardings` assigns
big matmul kernels ``P(..., "model")`` so XLA partitions the matmul and
its optimizer state across the model axis (Megatron-style column split;
the following fc2 consumes the psum'd activation).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_specs",
           "param_shardings", "shard_state"]


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data",
              model_parallel: int = 1) -> Mesh:
    """Data-parallel mesh over all (or the given) devices; pass
    ``model_parallel=k`` for a 2-D ``(data, model)`` mesh with k-way
    tensor parallelism."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices)
    if model_parallel > 1:
        if len(devices) % model_parallel:
            raise ValueError(
                f"{len(devices)} devices not divisible by "
                f"model_parallel={model_parallel}")
        grid = devices.reshape(-1, model_parallel)
        return Mesh(grid, (axis_name, "model"))
    return Mesh(devices, (axis_name,))


def param_shardings(mesh: Mesh, params: Any,
                    min_elements: int = 1 << 20) -> Any:
    """Per-leaf NamedShardings: 2-D kernels with >= ``min_elements``
    whose LAST dim divides the ``model`` axis are column-sharded
    ``P(None, "model")``; everything else is replicated.  On a 1-D mesh
    (no ``model`` axis) everything is replicated."""
    has_model = "model" in mesh.axis_names and \
        mesh.shape.get("model", 1) > 1
    repl = NamedSharding(mesh, P())

    def one(x):
        if has_model and hasattr(x, "ndim") and x.ndim == 2 and \
                x.size >= min_elements and \
                x.shape[-1] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P(None, "model"))
        return repl

    return jax.tree_util.tree_map(one, params)


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


def shard_state(tree: Any, mesh: Mesh,
                min_elements: int = 1 << 20) -> Any:
    """Place a training-state pytree on the mesh: big 2-D kernels (and
    their optimizer moments, which share shapes) column-sharded on the
    ``model`` axis per :func:`param_shardings`, everything else
    replicated.  Equivalent to :func:`replicate` on a 1-D mesh."""
    shardings = param_shardings(mesh, tree, min_elements)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
