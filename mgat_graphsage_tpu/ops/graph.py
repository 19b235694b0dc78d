"""Dense, mask-aware graph primitives (the TPU compute path).

Design: molecules are tiny graphs (11-94 atoms, reference ``README.md:127``),
so instead of PyG-style sparse gather/scatter (the reference's implicit
native layer — PyG's C++/CUDA scatter ops), message passing is phrased as
**batched dense matmuls on the MXU**: a per-molecule adjacency ``[B, N, N]``
is materialized on device from the padded edge list once per batch, and
every conv (GCN/SAGE/GAT/GIN/Cheb) becomes ``adj @ x`` with masking.  For a
94-atom budget this is strictly faster on TPU than scatter: the MXU runs a
128x128 systolic tile per cycle while scatter serializes through the VPU.

All ops are shape-polymorphic over leading batch dims and fully masked so
padding never leaks into results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "dense_adjacency",
    "dense_adjacency_einsum",
    "add_self_loops",
    "degree",
    "masked_softmax",
    "segment_max_pool",
    "segment_mean_pool",
    "segment_sum_pool",
    "gcn_norm_adjacency",
]

_NEG_INF = -1e9


def dense_adjacency(edges: jnp.ndarray, edge_mask: jnp.ndarray,
                    num_nodes: int,
                    use_pallas: bool = True) -> jnp.ndarray:
    """Build dense per-graph adjacency from a padded COO edge list.

    Args:
      edges: ``[B, 2, E]`` int32, ``edges[:, 0]`` = source, ``edges[:, 1]`` =
        destination (both directions present, reference ``train.py:46-55``).
      edge_mask: ``[B, E]`` 1.0 for real edges.
      num_nodes: padded node count N.

    Returns ``[B, N, N]`` float32 with ``adj[b, dst, src] = 1`` — row ``i``
    holds the in-neighborhood of node ``i``, so ``adj @ x`` aggregates
    messages from sources into destinations (PyG flow ``source_to_target``).

    On TPU, batches divisible by the kernel group ride the Pallas
    builder (`ops/pallas_adjacency.py`, measured 2.1x the scatter
    lowering, bit-identical); other shapes/backends use the vmapped
    scatter-add below.  When ``edge_mask`` must be DIFFERENTIATED
    (GNNExplainer mask optimization), use
    :func:`dense_adjacency_einsum` — the Pallas kernel defines no VJP,
    and this scatter path's forward + VJP lower to serial kCustom ops
    (measured 73% of the mask step, profiles/explain_stage3_bs64);
    ``use_pallas=False`` remains for parity tests of the scatter
    lowering itself.
    """
    if (use_pallas and edges.ndim == 3
            and jax.default_backend() == "tpu"
            and edges.shape[0] % 8 == 0):
        from .pallas_adjacency import dense_adjacency_pallas
        return dense_adjacency_pallas(edges, edge_mask, num_nodes)

    def one(e, m):
        src, dst = e[0], e[1]
        adj = jnp.zeros((num_nodes, num_nodes), jnp.float32)
        adj = adj.at[dst, src].add(m)
        return jnp.minimum(adj, 1.0)

    return jax.vmap(one)(edges, edge_mask)


def dense_adjacency_einsum(edges: jnp.ndarray, edge_mask: jnp.ndarray,
                           num_nodes: int) -> jnp.ndarray:
    """:func:`dense_adjacency` as a batched one-hot MXU contraction —
    the formulation to use when ``edge_mask`` is DIFFERENTIATED.

    Same math (``adj[b, dst, src] = min(sum_e mask_e, 1)``), but both
    the forward and the VJP w.r.t. ``edge_mask`` are batched matmuls
    instead of scatter/gather: inside GNNExplainer's 100-step mask
    optimization, the scatter path's forward + transpose lowered to two
    serial kCustom ops costing 73% of the whole stage (206 us of the
    282 us mask step — profiles/explain_stage3_bs64/OPS.json
    fusion.513/fusion.524, round 5).  The one-hot operands depend only
    on ``edges``, which is loop-invariant in the mask optimization, so
    XLA hoists them out of the scan.
    """
    src, dst = edges[..., 0, :], edges[..., 1, :]         # [B, E]
    n_iota = jnp.arange(num_nodes, dtype=edges.dtype)
    d1 = (dst[..., None, :] == n_iota[:, None]).astype(jnp.float32)
    s1 = (src[..., None, :] == n_iota[:, None]).astype(jnp.float32)
    s1 = s1 * edge_mask[..., None, :]
    # adj[b, i, j] = sum_e d1[b, i, e] s1[b, j, e]
    adj = jax.lax.dot_general(d1, s1, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return jnp.minimum(adj, 1.0)


def add_self_loops(adj: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """adj + I on valid nodes only."""
    eye = jnp.eye(adj.shape[-1], dtype=adj.dtype)
    return jnp.minimum(adj + eye * node_mask[..., None, :] *
                       node_mask[..., :, None], 1.0)


def degree(adj: jnp.ndarray) -> jnp.ndarray:
    """Row degree ``[B, N]`` (in-degree under our dst-row convention)."""
    return adj.sum(-1)


def gcn_norm_adjacency(adj: jnp.ndarray, node_mask: jnp.ndarray,
                       add_loops: bool = True) -> jnp.ndarray:
    """Symmetric GCN normalization ``D^-1/2 (A [+ I]) D^-1/2`` (PyG
    ``GCNConv`` semantics with ``add_self_loops=True``)."""
    if add_loops:
        adj = add_self_loops(adj, node_mask)
    deg = degree(adj)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return adj * inv_sqrt[..., :, None] * inv_sqrt[..., None, :]


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    """Softmax over ``axis`` with masked entries excluded.

    ``mask`` broadcasts against ``scores``; fully-masked rows return zeros
    (not NaN) so padded query rows are inert.
    """
    neg = jnp.where(mask > 0, 0.0, _NEG_INF)
    s = scores + neg
    s_max = jax.lax.stop_gradient(jnp.max(s, axis=axis, keepdims=True))
    unnorm = jnp.exp(s - s_max) * (mask > 0)
    denom = unnorm.sum(axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-16)


def segment_max_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked global max pool ``[B, N, F] -> [B, F]`` (PyG
    ``global_max_pool``, reference ``train.py:119``). Graphs with zero valid
    nodes pool to 0."""
    neg = jnp.where(node_mask[..., None] > 0, 0.0, _NEG_INF).astype(x.dtype)
    pooled = jnp.max(x + neg, axis=-2)
    any_valid = node_mask.max(axis=-1, keepdims=True) > 0
    return jnp.where(any_valid, pooled, 0.0)


def segment_mean_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked global mean pool (PyG ``global_mean_pool``)."""
    s = (x * node_mask[..., None]).sum(-2)
    cnt = jnp.maximum(node_mask.sum(-1, keepdims=True), 1.0)
    return s / cnt


def segment_sum_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked global add pool (PyG ``global_add_pool``)."""
    return (x * node_mask[..., None]).sum(-2)
