"""Graph compute primitives: dense MXU path, segment ops, Pallas kernels."""

from .graph import (
    add_self_loops,
    degree,
    dense_adjacency,
    gcn_norm_adjacency,
    masked_softmax,
    segment_max_pool,
    segment_mean_pool,
    segment_sum_pool,
)
from .segment import (
    gather,
    scatter_sum,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)

__all__ = [
    "add_self_loops", "degree", "dense_adjacency", "gcn_norm_adjacency",
    "masked_softmax", "segment_max_pool", "segment_mean_pool",
    "segment_sum_pool", "gather", "scatter_sum", "segment_max",
    "segment_mean", "segment_softmax", "segment_sum",
]
