from .distributed import (
    global_batch_from_local,
    host_row_slice,
    initialize_distributed,
    is_distributed,
)
from .mesh import (
    data_parallel_specs,
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
    shard_state,
)

__all__ = [
    "data_parallel_specs", "make_mesh", "replicate", "shard_batch",
    "initialize_distributed", "is_distributed", "host_row_slice",
    "global_batch_from_local", "param_shardings", "shard_state",
]
