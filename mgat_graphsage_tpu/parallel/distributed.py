"""Multi-host (multi-process) runtime: ``jax.distributed`` init + per-host
data loading helpers.

The reference is strictly single-process (``torch.distributed`` never
imported — SURVEY.md §2.4); this module supplies the TPU-pod story the
SURVEY commits to: each host initializes the JAX coordination service,
loads its own shard of the dataset over DCN, and assembles **global**
device arrays spanning the whole mesh with
``jax.make_array_from_process_local_data``.  Training then runs the same
jit/SPMD programs as single-host — XLA routes the gradient all-reduce over
ICI within a pod slice and DCN across slices.

Smoke-tested with 2 processes x 4 virtual CPU devices in
``tests/test_distributed.py`` (Gloo-backed CPU collectives).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "host_row_slice",
    "global_batch_from_local",
]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-process runtime (idempotent).

    On Cloud TPU pods all three arguments are auto-detected from the
    metadata server; elsewhere (our CPU smoke test, ad-hoc clusters) they
    come from the arguments or the ``MGAT_COORDINATOR`` /
    ``MGAT_NUM_PROCESSES`` / ``MGAT_PROCESS_ID`` environment variables.
    """
    import jax

    # idempotence check that does NOT touch the XLA backend
    # (jax.process_count() would initialize it, after which
    # jax.distributed.initialize refuses to run)
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "MGAT_COORDINATOR")
    if num_processes is None and "MGAT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MGAT_NUM_PROCESSES"])
    if process_id is None and "MGAT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MGAT_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_distributed() -> bool:
    import jax

    return jax.process_count() > 1


def host_row_slice(n_rows: int,
                   process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> Tuple[int, int]:
    """This host's contiguous ``[start, stop)`` slice of a dataset with
    ``n_rows`` rows — per-host loading over DCN instead of every host
    reading (and featurizing) the whole CSV.  The split is as even as
    possible; early hosts take the remainder."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_rows, pc)
    start = pi * base + min(pi, rem)
    stop = start + base + (1 if pi < rem else 0)
    return start, stop


def global_batch_from_local(mesh: Any, local: Any,
                            axis_name: str = "data") -> Any:
    """Assemble global data-sharded device arrays from per-host numpy
    shards (each host passes only ITS rows; the result's leading axis is
    the concatenation across hosts, sharded over ``axis_name``)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local)
