from .mesh import data_parallel_specs, make_mesh, replicate, shard_batch

__all__ = ["data_parallel_specs", "make_mesh", "replicate", "shard_batch"]
