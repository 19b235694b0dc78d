"""Fused masked-attention Pallas TPU kernel (the ModifiedGAT hot op).

The ModifiedGAT layer's core is, per molecule,
    scores = K_new @ Q^T / sqrt(F);  attn = masked_softmax(scores);
    out    = attn @ V  (+ V)
(reference ``train.py:96-98`` semantics — note the transposed Q/K roles,
see ``models/layers.py``).

The XLA path materializes ``scores [B, N, N]`` and ``attn [B, N, N]`` in
HBM between fusions.  This kernel keeps the whole per-molecule attention
resident in VMEM: one grid step per molecule loads Q/K/V blocks
([N, F] each, N<=128, F<=128 — a few hundred KB), computes scores,
softmax and the output matmul on the MXU/VPU without touching HBM in
between.  Numerics match ``ops.masked_softmax``-based XLA attention to
float32 tolerance (see tests/test_pallas.py).

Falls back to the pure-XLA implementation on non-TPU backends (the
kernel itself also runs under ``interpret=True`` for CPU tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_masked_attention", "attention_reference"]

_NEG_INF = -1e9


def attention_reference(q: jnp.ndarray, k_new: jnp.ndarray, v: jnp.ndarray,
                        node_mask: jnp.ndarray,
                        residual: bool = True) -> jnp.ndarray:
    """Pure-XLA reference implementation (and non-TPU fallback)."""
    from .graph import masked_softmax

    f = q.shape[-1]
    scores = jnp.einsum("...if,...jf->...ij", k_new, q,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(f)
    attn = masked_softmax(scores, node_mask[..., None, :], axis=-1)
    out = jnp.einsum("...ij,...jf->...if", attn, v,
                     preferred_element_type=jnp.float32)
    return out + v if residual else out


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *,
                      scale: float, residual: bool):
    q = q_ref[0]            # [N, F]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0]      # [1, N] — key-axis validity

    # scores[i, j] = k[i] . q[j] * scale       (transposed-QK quirk)
    scores = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    neg = jnp.where(mask > 0, 0.0, _NEG_INF)    # [1, N] broadcasts over i
    s = scores + neg
    s_max = jnp.max(s, axis=-1, keepdims=True)
    unnorm = jnp.exp(s - s_max) * (mask > 0)
    denom = jnp.maximum(unnorm.sum(-1, keepdims=True), 1e-16)
    attn = unnorm / denom
    out = jnp.dot(attn, v, preferred_element_type=jnp.float32)
    if residual:
        out = out + v
    out_ref[0] = out


def _block_specs(n: int, f: int):
    qkv = pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return qkv, msk


def _forward_call(q, k_new, v, mask2d, residual: bool, interpret: bool):
    b, n, f = q.shape
    scale = 1.0 / math.sqrt(f)
    qkv, msk = _block_specs(n, f)
    kernel = functools.partial(_attention_kernel, scale=scale,
                               residual=residual)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[qkv, qkv, qkv, msk],
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct((b, n, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n * n * f * 2),
            bytes_accessed=4 * b * n * f * 4,
            transcendentals=b * n * n,
        ),
        interpret=interpret,
    )(q, k_new, v, mask2d)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                          dq_ref, dk_ref, dv_ref, *,
                          scale: float, residual: bool):
    """Recompute attn in VMEM (flash-style), then the three grad matmuls."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0]
    g = g_ref[0]

    scores = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    neg = jnp.where(mask > 0, 0.0, _NEG_INF)
    s = scores + neg
    s_max = jnp.max(s, axis=-1, keepdims=True)
    unnorm = jnp.exp(s - s_max) * (mask > 0)
    denom = jnp.maximum(unnorm.sum(-1, keepdims=True), 1e-16)
    attn = unnorm / denom                                    # [N, N]

    # dv = attn^T @ g (+ g for the residual)
    dv = jax.lax.dot_general(
        attn, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if residual:
        dv = dv + g
    # softmax backward: dscores = attn * (dattn - rowsum(dattn * attn))
    dattn = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [N, N]
    row = (dattn * attn).sum(-1, keepdims=True)
    dscores = attn * (dattn - row)
    # dk_new = scale * dscores @ q ; dq = scale * dscores^T @ k_new
    dk_ref[0] = scale * jnp.dot(dscores, q,
                                preferred_element_type=jnp.float32)
    dq_ref[0] = scale * jax.lax.dot_general(
        dscores, k, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv_ref[0] = dv


def _backward_call(q, k_new, v, mask2d, g, residual: bool,
                   interpret: bool):
    b, n, f = q.shape
    scale = 1.0 / math.sqrt(f)
    qkv, msk = _block_specs(n, f)
    kernel = functools.partial(_attention_bwd_kernel, scale=scale,
                               residual=residual)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[qkv, qkv, qkv, msk, qkv],
        out_specs=(qkv, qkv, qkv),
        out_shape=(jax.ShapeDtypeStruct((b, n, f), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, f), jnp.float32),
                   jax.ShapeDtypeStruct((b, n, f), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * (n * n * f * 2),
            bytes_accessed=8 * b * n * f * 4,
            transcendentals=b * n * n,
        ),
        interpret=interpret,
    )(q, k_new, v, mask2d, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_masked_attention(q: jnp.ndarray, k_new: jnp.ndarray,
                           v: jnp.ndarray, node_mask: jnp.ndarray,
                           residual: bool = True,
                           interpret: bool = False) -> jnp.ndarray:
    """Per-molecule fused masked attention with a custom VJP.

    Args: q, k_new, v ``[B, N, F]``; node_mask ``[B, N]``.
    Returns ``[B, N, F]`` (padded query rows produce garbage exactly like
    the XLA path — they are masked downstream by pooling).  Backward
    recomputes the attention matrix in VMEM rather than storing
    ``[B, N, N]`` residuals in HBM.
    """
    b, n, _ = q.shape
    return _forward_call(q, k_new, v, node_mask.reshape(b, 1, n),
                         residual, interpret)


def _fwd(q, k_new, v, node_mask, residual, interpret):
    out = fused_masked_attention(q, k_new, v, node_mask, residual,
                                 interpret)
    return out, (q, k_new, v, node_mask)


def _bwd(residual, interpret, res, g):
    q, k_new, v, node_mask = res
    b, n, _ = q.shape
    dq, dk, dv = _backward_call(q, k_new, v, node_mask.reshape(b, 1, n),
                                g, residual, interpret)
    return dq, dk, dv, None


fused_masked_attention.defvjp(_fwd, _bwd)
