"""Segment-ID (flat/packed layout) message-passing primitives.

The alternative data layout to ``ops/graph.py``'s padded-dense one: all
nodes of a batch packed into one flat ``[P, F]`` buffer with an int segment
ID per node (jraph-style).  Used by (a) the reference-parity "flat" mode of
the ModifiedGAT layer, whose attention deliberately crosses molecule
boundaries (reference ``train.py:96-98`` attends over the whole batched node
set), and (b) the Pallas fused gather/segment-sum kernels.

Pure-XLA implementations built on ``jax.ops.segment_*`` — these lower to
efficient one-hot matmuls / sorted scatters on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_softmax",
    "gather", "scatter_sum",
]


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(jnp.ones(data.shape[:1], data.dtype),
                              segment_ids, num_segments=num_segments)
    return s / jnp.maximum(cnt, 1.0)[..., None]


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Numerically stable softmax within each segment (edge-softmax)."""
    seg_max = jax.ops.segment_max(logits, segment_ids,
                                  num_segments=num_segments)
    seg_max = jnp.nan_to_num(seg_max, neginf=0.0)
    shifted = logits - seg_max[segment_ids]
    e = jnp.exp(shifted)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    return e / jnp.maximum(denom[segment_ids], 1e-16)


def gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(x, idx, axis=0)


def scatter_sum(data: jnp.ndarray, idx: jnp.ndarray, num: int) -> jnp.ndarray:
    return jnp.zeros((num,) + data.shape[1:], data.dtype).at[idx].add(data)
