"""Neural layers (flax.linen), matching the reference's PyTorch semantics.

Every layer operates on the padded-dense batch layout: node features
``x [B, N, F]``, dense adjacency ``adj [B, N, N]`` (built once per batch by
``ops.dense_adjacency``), and ``node_mask [B, N]``.  Initializers replicate
PyTorch defaults (Kaiming-uniform with a=sqrt(5) == U(+-1/sqrt(fan_in)) for
Linear/Conv1d; glorot for PyG conv weights) so weight-for-weight parity
tests against the reference semantics hold.

Layer-by-layer reference citations are in each docstring.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    add_self_loops,
    gcn_norm_adjacency,
    masked_softmax,
)

__all__ = [
    "TorchLinear",
    "CenterTapConv1d",
    "ModifiedGATLayer",
    "SAGEConv",
    "GCNConv",
    "GATConv",
    "GINConv",
    "ChebConvRef",
    "MaskedBatchNorm",
    "CNNNet",
    "CombinedNet",
    "cnn_fc1_torch_to_pos_major",
    "cnn_fc1_pos_major_to_torch",
]


def cnn_fc1_torch_to_pos_major(kernel, channels: int = 128):
    """Reorder a channel-major CNN fc1 kernel into pos-major storage.

    torch flattens the conv stack channel-major (``x.view(B, -1)`` on
    ``[B, C, W]`` -> row index ``c*W + w``); ``CNNNet`` here flattens
    pos-major (row index ``w*C + c`` — see the class docstring for the
    traced reason).  The two are a pure row permutation of the fc1
    kernel; this converts torch order -> native order at interchange
    time (``compat.reference_state_dicts_to_params``).  Works on numpy
    and jax arrays alike.
    """
    cw, h = kernel.shape
    w = cw // channels
    return kernel.reshape(channels, w, h).transpose(1, 0, 2).reshape(cw, h)


def cnn_fc1_pos_major_to_torch(kernel, channels: int = 128):
    """Inverse of :func:`cnn_fc1_torch_to_pos_major` (native -> torch)."""
    cw, h = kernel.shape
    w = cw // channels
    return kernel.reshape(w, channels, h).transpose(1, 0, 2).reshape(cw, h)


def _uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear's default init:
    kernel and bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound),
                            (fan_in, self.features))
        bias = (self.param("bias", _uniform_init(bound), (self.features,))
                if self.use_bias else None)
        if params_only:
            # create the params (identical tree/init) but let the caller
            # compute — used by CNNNet's fused-Pallas-backward path,
            # where the whole conv+fc1 chain is one custom_vjp function
            return kernel, bias
        # f32 MXU accumulation, result stored back in the activation dtype
        # (bf16 end-to-end under TrainConfig.compute_dtype='bfloat16')
        y = jnp.dot(x, kernel,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            y = y + bias
        return y


class TorchConv1d(nn.Module):
    """1-D convolution with torch ``nn.Conv1d`` init, dual-layout.

    Param tree is identical to ``flax.linen.Conv`` (``kernel [K, I, O]``,
    ``bias [O]``, same U(-1/sqrt(I*K), ·) init), so checkpoints and
    torch weight transfer are unaffected.  The layout is chosen per
    call: ``ncw=False`` runs the standard TPU-friendly NWC conv;
    ``ncw=True`` runs torch's native NCW layout.

    Why NCW exists: the profiler trace of the bf16 train step
    (profiles/bf16_full) showed the flatten before ``CNNNet``'s fc1
    costing ~150 us/step in pure layout copies (copy.387 fwd +
    copy.403 bwd, 7% of the step; 412 us/step = 13% at batch 256).
    Round 3 ran the bf16 convs in NCW so torch's channel-major flatten
    would be a row-major reshape — but XLA still lays the NCW conv
    output out position-minor ({0,2,1}), so the copy survived.  Round 4
    fixed it at the flatten instead: ``CNNNet`` flattens POS-major
    (``[B, W, C] -> [B, W*C]``, free in XLA's chosen layout) with the
    fc1 kernel rows stored permuted to match — after which NCW and NWC
    compile to the IDENTICAL program (traced,
    profiles/bf16_full_bs256_posmajor), so ``CNNNet`` now uses plain
    NWC for every dtype and ``ncw=True`` remains only as a tested
    layout option.  (A round-3 attempt expressed fc1 as a
    two-contracting-dim einsum instead — XLA resolved it by transposing
    the 67MB kernel every step and the step REGRESSED 2.20->2.69 ms;
    the layout must be fixed where it is cheap, not inside the matmul.)
    """

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, ncw: bool = False,
                 params_only: bool = False):
        in_ch = x.shape[1] if ncw else x.shape[-1]
        bound = 1.0 / math.sqrt(in_ch * self.kernel_size)
        kernel = self.param("kernel", _uniform_init(bound),
                            (self.kernel_size, in_ch, self.features))
        bias = self.param("bias", _uniform_init(bound), (self.features,))
        if params_only:
            # see TorchLinear: param creation without compute, for the
            # fused-Pallas-backward CNN path
            return kernel, bias
        dn = ("NCW", "WIO", "NCW") if ncw else ("NWC", "WIO", "NWC")
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1,), "SAME",
            dimension_numbers=dn)
        bias = bias.astype(y.dtype)
        return y + (bias[None, :, None] if ncw else bias)


class GlorotLinear(nn.Module):
    """Dense layer with PyG's glorot weight init and zero/uniform bias."""

    features: int
    use_bias: bool = True
    bias_init: str = "zeros"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (fan_in, self.features))
        y = jnp.dot(x, kernel,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            if self.bias_init == "zeros":
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
            else:
                bound = 1.0 / math.sqrt(fan_in)
                bias = self.param("bias", _uniform_init(bound),
                                  (self.features,))
            y = y + bias
        return y


class CenterTapConv1d(nn.Module):
    """The reference's Conv1d-over-a-length-1-axis quirk, replicated exactly.

    Reference ``train.py:83-93``: ``K.unsqueeze(2)`` makes the Conv1d spatial
    length 1, so with kernel size k and 'same' padding only the **center
    kernel tap** ever touches data — the layer degenerates to a linear map
    using ``weight[:, :, k//2]`` plus bias.  We keep the full ``[out, in, k]``
    parameter (torch checkpoint-shape parity, torch-default init over the
    full fan_in = in*k) but compute only the center tap, which is exactly
    what the reference computes.
    """

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        bound = 1.0 / math.sqrt(in_f * self.kernel_size)
        weight = self.param("weight", _uniform_init(bound),
                            (self.features, in_f, self.kernel_size))
        bias = self.param("bias", _uniform_init(bound), (self.features,))
        center = weight[:, :, self.kernel_size // 2]  # [out, in]
        return jnp.dot(x, center.T,
                       preferred_element_type=jnp.float32).astype(x.dtype) \
            + bias


class ModifiedGATLayer(nn.Module):
    """The "M-GAT" dense QKV attention layer (reference ``train.py:77-99``).

    Faithful reproduction of the reference's (quirky) math:
      - Q, K, V = three Linear(F->F) maps;
      - K is passed through Conv1d(k=3) and Conv1d(k=5) over a length-1
        spatial axis (center-tap only; see :class:`CenterTapConv1d`);
      - K_new = Linear(3F->F)(concat[K3, K5, K]);
      - scores[i, j] = K_new[i] . Q[j] / sqrt(F)  — note the transposed
        query/key roles produced by the reference's broadcasting
        (``train.py:96``: ``matmul(Q, K_new.transpose(1, 2))`` with 2D Q);
      - attention = softmax over j; out[i] = sum_j attn[i,j] V[j] (+ V[i]
        when ``residual``, the model-2 vs model-3 ablation axis,
        ``ablation/model 2.py:78`` vs ``model 3.py:78``).

    Attention scope: the reference attends over **all nodes in the batched
    graph**, crossing molecule boundaries (``SURVEY.md`` §2.6).  Default
    here is per-molecule masked attention (``flat=False``); ``flat=True``
    reshapes the batch to one flat node set to reproduce reference numerics
    exactly (attention then depends on batch composition, as in the
    reference).
    """

    features: int
    residual: bool = True
    flat: bool = False
    # Pallas fused-attention kernel: opt-in.  Measured on a real v5e at
    # the production shape [128, 80, 35] (BENCH_PALLAS.json) the kernel
    # is 0.76x XLA fwd / 0.70x fwd+bwd — at F=35 the op is too small for
    # a hand kernel to beat XLA's own fusion, so the default is the XLA
    # path; the kernel stays available (and correctness-tested) for
    # larger feature dims where VMEM blocking pays off.
    use_pallas: Optional[bool] = None   # None = auto (currently: off)

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 node_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        orig_shape = x.shape
        if self.flat and x.ndim == 3:
            x = x.reshape(1, -1, x.shape[-1])
            node_mask = None if node_mask is None else node_mask.reshape(1, -1)

        in_dtype = x.dtype
        q = TorchLinear(self.features, name="query_transform")(x)
        k = TorchLinear(self.features, name="key_transform")(x)
        v = TorchLinear(self.features, name="value_transform")(x)
        k3 = CenterTapConv1d(self.features, 3, name="conv3")(k)
        k5 = CenterTapConv1d(self.features, 5, name="conv5")(k)
        k_new = TorchLinear(self.features, name="linear_transform")(
            jnp.concatenate([k3, k5, k], axis=-1))
        # attention internals (scores/softmax/weighted sum) run in f32 even
        # under a bf16 compute dtype — the [N, N] intermediates are tiny at
        # F=35, so this costs nothing and keeps the softmax well-conditioned.
        # node_mask must be f32 too: a bf16 mask trips a Mosaic relayout
        # bug in the Pallas kernel's bf16->i1 compare on real TPUs
        q, k_new, v = (t.astype(jnp.float32) for t in (q, k_new, v))
        if node_mask is not None:
            node_mask = node_mask.astype(jnp.float32)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = False  # measured: XLA wins at this shape
        # the fused kernel keeps the whole [N, N] attention in VMEM — only
        # valid for per-molecule N (flat mode concatenates the batch into
        # one node set of B*N, whose scores blow the 16MB VMEM budget)
        if self.flat or x.shape[-2] > 512:
            use_pallas = False
        if use_pallas and node_mask is not None and x.ndim == 3:
            from ..ops.pallas_attention import fused_masked_attention
            out = fused_masked_attention(q, k_new, v, node_mask,
                                         self.residual)
        else:
            # scores[b, i, j] = k_new[b, i] . q[b, j] / sqrt(F)
            scores = jnp.einsum("...if,...jf->...ij", k_new, q,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(self.features)
            if node_mask is None:
                attn = jax.nn.softmax(scores, axis=-1)
            else:
                attn = masked_softmax(scores, node_mask[..., None, :],
                                      axis=-1)
            out = jnp.einsum("...ij,...jf->...if", attn, v,
                             preferred_element_type=jnp.float32)
            if self.residual:
                out = out + v
        out = out.astype(in_dtype)
        if self.flat and len(orig_shape) == 3:
            out = out.reshape(orig_shape[:-1] + (self.features,))
        return out


class SAGEConv(nn.Module):
    """GraphSAGE mean-aggregation conv, PyG semantics
    (``SAGEConv(in, out)``, used at reference ``train.py:106,117`` and
    ``gnn/graphsage.py:53-54``):

        out = lin_l(mean_{j in N(i)} x_j) + lin_r(x_i)

    with bias on ``lin_l`` only, no self-loops added, mean over in-edges.
    Dense form: ``adj @ x / deg``.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray,
                 node_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        deg = adj.sum(-1, keepdims=True)
        agg = jnp.einsum("...ij,...jf->...if", adj, x,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        agg = agg / jnp.maximum(deg, 1.0).astype(x.dtype)
        out = TorchLinear(self.features, name="lin_l")(agg)
        out = out + TorchLinear(self.features, use_bias=False,
                                name="lin_r")(x)
        return out


class GCNConv(nn.Module):
    """Kipf-Welling GCN conv, PyG semantics (``gnn/gcn.py:46-48``):
    symmetric normalization with self-loops, glorot weight, and a
    zero-initialized bias added AFTER aggregation (PyG adds ``self.bias``
    to the propagated output, not to the per-node linear map — the two
    differ once the bias trains away from zero)."""

    features: int
    add_loops: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray,
                 node_mask: jnp.ndarray) -> jnp.ndarray:
        norm_adj = gcn_norm_adjacency(adj, node_mask, add_loops=self.add_loops)
        h = GlorotLinear(self.features, use_bias=False, name="lin")(x)
        out = jnp.einsum("...ij,...jf->...if", norm_adj, h,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + bias


class GATConv(nn.Module):
    """Multi-head edge-softmax graph attention, PyG semantics
    (``gnn/gat.py:54-55``, ``ablation/model1.py:57``):

        e_ij = LeakyReLU(a_src . (W x_j) + a_dst . (W x_i))
        alpha_ij = softmax_{j in N(i) + {i}}(e_ij)       (self-loops added)
        out_i = concat_h sum_j alpha_ij W x_j  (+ bias)

    Attention-coefficient dropout as in PyG (applied in train mode).
    """

    features: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_loops: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray,
                 node_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h, c = self.heads, self.features
        wx = GlorotLinear(h * c, use_bias=False, name="lin")(x)
        wx = wx.reshape(x.shape[:-1] + (h, c))              # [B, N, H, C]
        att_src = self.param("att_src", nn.initializers.glorot_uniform(),
                             (1, h, c))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(),
                             (1, h, c))
        a_src = (wx * att_src).sum(-1)                      # [B, N, H]
        a_dst = (wx * att_dst).sum(-1)
        # logits[b, h, i, j] = dst_i + src_j
        logits = (jnp.swapaxes(a_dst, -1, -2)[..., :, None]
                  + jnp.swapaxes(a_src, -1, -2)[..., None, :])
        logits = nn.leaky_relu(logits, self.negative_slope)
        mask_adj = add_self_loops(adj, node_mask) if self.add_loops else adj
        attn = masked_softmax(logits, mask_adj[..., None, :, :], axis=-1)
        if self.dropout > 0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout, deterministic=False)(attn)
        out = jnp.einsum("...hij,...jhc->...ihc", attn, wx,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if self.concat:
            out = out.reshape(x.shape[:-1] + (h * c,))
            bias = self.param("bias", nn.initializers.zeros, (h * c,))
        else:
            out = out.mean(-2)
            bias = self.param("bias", nn.initializers.zeros, (c,))
        return out + bias


class GINConv(nn.Module):
    """Graph isomorphism conv, PyG semantics (``gnn/gin.py:64``):
    ``MLP((1 + eps) x + sum_{j in N(i)} x_j)`` with eps = 0 fixed;
    the MLP is Linear(d->dim) -> ReLU -> Linear(dim->dim)."""

    hidden: int
    out: int
    eps: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray,
                 node_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        agg = jnp.einsum("...ij,...jf->...if", adj, x,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        h = (1.0 + self.eps) * x + agg
        h = TorchLinear(self.hidden, name="mlp_0")(h)
        h = nn.relu(h)
        return TorchLinear(self.out, name="mlp_1")(h)


class ChebConvRef(nn.Module):
    """The reference's hand-rolled "Chebyshev" conv (``gnn/chebnet.py:50-73``)
    — deliberately including its nonstandard pseudo-Laplacian:

        L[i, j] = -A[i, j];  L[i, i] = -deg(i)      (i.e. L = -(A + D))
        T_0 = I, T_1 = L, T_k = 2 L T_{k-1} - T_{k-2}
        out = Linear(sum_{k<K} T_k @ x)

    The reference builds L over the whole batched node set; since edges
    never cross molecules the matrix is block-diagonal, so the padded
    per-graph dense form below is numerically identical.
    """

    features: int
    k: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray,
                 node_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        deg = adj.sum(-1)
        lap = -adj - jnp.einsum("...i,ij->...ij", deg,
                                jnp.eye(adj.shape[-1], dtype=adj.dtype))
        t_prev = x                       # T_0 @ x
        t_cur = jnp.einsum("...ij,...jf->...if", lap, x,
                           preferred_element_type=jnp.float32)  # T_1 @ x
        out = t_prev + t_cur
        for _ in range(2, self.k):
            t_next = 2.0 * jnp.einsum("...ij,...jf->...if", lap, t_cur,
                                      preferred_element_type=jnp.float32) \
                     - t_prev
            out = out + t_next
            t_prev, t_cur = t_cur, t_next
        return TorchLinear(self.features, name="lin")(out)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the node axis with padding-aware statistics.

    The reference applies ``nn.BatchNorm1d`` to the concatenated node set
    (``gnn/gin.py:65-80``), i.e. statistics over all *real* nodes in the
    batch; padded slots must be excluded here to match.  Running stats use
    torch's momentum convention (new = (1-m)*old + m*batch, m=0.1).
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray,
                 use_running_average: bool = False) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,)))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # statistics always accumulate in f32 — under
            # compute_dtype='bfloat16' a bf16 sum over thousands of nodes
            # quantizes the count/mean and the error compounds through the
            # running-stat EMA every step (torch.autocast likewise keeps
            # batch_norm in f32)
            xf = x.astype(jnp.float32)
            w = node_mask.astype(jnp.float32)[..., None]
            cnt = jnp.maximum(w.sum(), 1.0)
            mean = (xf * w).sum(axis=tuple(range(x.ndim - 1))) / cnt
            var = (((xf - mean) ** 2) * w).sum(
                axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                # torch uses the unbiased variance for running stats
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        y = (x - mean.astype(x.dtype)) \
            * jax.lax.rsqrt(var + self.eps).astype(x.dtype) * scale + bias
        return y


class CNNNet(nn.Module):
    """Fingerprint 1D-CNN branch (reference ``train.py:127-146``):
    Conv1d 1->32->64->128 (k=3, same padding, ReLU) over the bit axis,
    flatten, FC(128*nbits -> fc_hidden) -> ReLU -> dropout -> FC(-> out).

    ``fc_hidden`` is 256 for 1024-bit inputs and 512 for the wide ECFP-2048
    variant (reference ``fingerprint/ecfp=2024.py:125-126``).
    """

    input_dim: int
    output_dim: int
    fc_hidden: int = 256
    dropout: float = 0.3
    pallas_bwd: bool = False

    @nn.compact
    def __call__(self, fp: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        from ..ops.pallas_cnn import chain_shapes_supported, cnn_tail

        if self.pallas_bwd and chain_shapes_supported(fp.shape[0],
                                                      self.input_dim):
            # Fused Pallas backward (ops/pallas_cnn.py): identical param
            # tree (params_only creates them through the same submodule
            # scopes), identical forward math, hand-tiled backward.
            dt = fp.dtype
            k1, b1 = TorchConv1d(32, name="conv1")(fp[..., None],
                                                   params_only=True)
            k2, b2 = TorchConv1d(64, name="conv2")(
                jnp.zeros((1, 1, 32), dt), params_only=True)
            k3, b3 = TorchConv1d(128, name="conv3")(
                jnp.zeros((1, 1, 64), dt), params_only=True)
            fk, fb = TorchLinear(self.fc_hidden, name="fc1")(
                jnp.zeros((1, self.input_dim * 128), dt), params_only=True)
            x = cnn_tail(fp, k1, b1, k2, b2, k3, b3, fk, fb,
                         jax.default_backend() != "tpu")
        else:
            # One layout for every dtype: TPU-standard NWC.  (Round 3 ran
            # bf16 in torch's NCW to help the then-channel-major flatten;
            # with the pos-major flatten below, NCW and NWC compile to the
            # IDENTICAL program — traced, profiles/bf16_full_bs256_posmajor
            # — so the dual path was retired.)
            x = fp[..., None]  # [B, nbits] -> [B, nbits, 1]
            for i, ch in enumerate((32, 64, 128)):
                x = TorchConv1d(features=ch, name=f"conv{i + 1}")(x)
                x = nn.relu(x)
            # POS-MAJOR flatten (divergence from torch's channel-major
            # x.view(B, -1), reference train.py:141): [B, W, C] -> [B, W*C]
            # is the physically free reshape — XLA lays conv output out
            # position-minor, so torch's channel-major flatten costs a
            # materialized copy each way (412 us/step at batch 256, 13% of
            # the step — profiles/bf16_full_bs256/OPS.json
            # copy.387/copy.403).  The fc1 kernel rows are stored pos-major
            # (row = w*128 + c) to match; torch interchange permutes ONCE
            # at conversion (cnn_fc1_torch_to_pos_major), so checkpoints
            # and parity are exact.  Measured: 77.9k -> 84.6k mol/s at
            # batch 256 (BENCH_STEP.json), 59.0k -> 70.0k at batch 128.
            x = x.reshape(x.shape[0], -1)
            x = TorchLinear(self.fc_hidden, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return TorchLinear(self.output_dim, name="fc2")(x)


class CombinedNet(nn.Module):
    """Fusion head (reference ``train.py:149-160``):
    FC(graph+fp dims -> hidden) -> ReLU -> dropout(0.3) -> FC(hidden -> 1)."""

    hidden_dim: int
    output_dim: int = 1
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = TorchLinear(self.hidden_dim, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        return TorchLinear(self.output_dim, name="fc2")(h)
