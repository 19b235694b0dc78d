"""Pallas TPU kernel: dense adjacency construction from padded COO edges.

Replaces the vmapped scatter-add in :func:`ops.graph.dense_adjacency` on
TPU.  XLA lowers that scatter (and equivalently a one-hot einsum) to
~311us for a [128, 160-edge, 72-node] batch because the one-hot
operands round-trip HBM; this kernel builds the one-hots in VMEM and
contracts them on the MXU per molecule-group without ever materializing
them — measured 148us for the same batch on a v5e (2.1x), bit-identical
output.

Semantics match ``dense_adjacency`` exactly (reference ``train.py:46-55``
edge construction): ``adj[b, dst, src] = min(sum_e mask_e, 1)``.

The kernel is used automatically on TPU when the batch divides the
molecule group size; other shapes fall back to the scatter path
(``ops/graph.py``).  Not differentiable — adjacency is a constant
w.r.t. model parameters, so no VJP is ever requested through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["dense_adjacency_pallas", "GROUP"]

# molecules per grid step: the sweet spot measured on v5e (8/16/32 all
# within 2%; 8 minimizes VMEM at ~2.9MB for the 176-edge budget) — must
# be a multiple of 8 (f32 sublane tiling on the mask block)
GROUP = 8


def _adj_kernel(edges_ref, emask_ref, out_ref, *, n_nodes: int):
    """One grid step: [G] molecules' adjacencies, VMEM-resident.

    edges_ref: [G, 2, E] int32; emask_ref: [G, E] f32;
    out_ref: [G, N, N] f32.
    """
    g, _, e = edges_ref.shape
    n = n_nodes
    src = edges_ref[:, 0, :]                                   # [G, E]
    dst = edges_ref[:, 1, :]
    m = emask_ref[:, :]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (g, n, e), 1)
    d1 = (dst[:, None, :] == n_iota).astype(jnp.float32)       # [G, N, E]
    s1 = (src[:, None, :] == n_iota).astype(jnp.float32) * m[:, None, :]
    # adj[g, i, j] = sum_e d1[g, i, e] * s1[g, j, e]  (MXU contraction)
    adj = jax.lax.dot_general(d1, s1, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out_ref[:, :, :] = jnp.minimum(adj, 1.0)


def dense_adjacency_pallas(edges: jnp.ndarray, edge_mask: jnp.ndarray,
                           num_nodes: int, group: int = GROUP,
                           interpret: bool = False) -> jnp.ndarray:
    """``[B, 2, E]`` int32 + ``[B, E]`` mask -> ``[B, N, N]`` f32 adjacency.

    Requires ``B % group == 0`` (callers fall back to the scatter path
    otherwise).
    """
    b, _, e = edges.shape
    if b % group:
        raise ValueError(f"batch {b} not divisible by group {group}")
    kern = functools.partial(_adj_kernel, n_nodes=num_nodes)
    return pl.pallas_call(
        kern,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, 2, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, e), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((group, num_nodes, num_nodes),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, num_nodes, num_nodes),
                                       jnp.float32),
        interpret=interpret,
    )(edges, edge_mask)
