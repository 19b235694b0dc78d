"""The model zoo: flagship hybrid, six baselines, and all ablation variants.

One parameterized graph-branch module (:class:`GATGraphSAGE`) covers the
flagship (reference ``train.py:102-124``) and the six-step ablation ladder
(``ablation/model1.py`` ... ``model 6.py``); the baselines GCN/GraphSAGE/
GAT/GAT-GCN/GIN/ChebNet reproduce ``gnn/*.py``.  All models share one input
convention: ``(nodes [B,N,F], adj [B,N,N], node_mask [B,N])`` (+ ``fp`` for
hybrid models) and return ``[B, 1]`` predictions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment_max_pool, segment_mean_pool, segment_sum_pool
from .layers import (
    CNNNet,
    ChebConvRef,
    CombinedNet,
    GATConv,
    GCNConv,
    GINConv,
    MaskedBatchNorm,
    ModifiedGATLayer,
    SAGEConv,
    TorchLinear,
)

__all__ = [
    "GATGraphSAGE", "HybridModel", "GCNNet", "SAGENet", "GATNet",
    "GATGCN", "GINConvNet", "ChebNet", "kl_loss",
]


def kl_loss(latent: jnp.ndarray, sample_mask: Optional[jnp.ndarray] = None
            ) -> jnp.ndarray:
    """KL(N(mu, sigma^2) || N(0, 1)) over the batch-latent distribution
    (reference ``train.py:70-74``): mean/var per latent dim across the batch,
    summed (not meaned) over latent dims; var is torch's unbiased variance."""
    if sample_mask is not None:
        w = sample_mask[:, None]
        cnt = jnp.maximum(w.sum(), 1.0)
        mean = (latent * w).sum(0) / cnt
        var = (((latent - mean) ** 2) * w).sum(0) / jnp.maximum(cnt - 1.0, 1.0)
    else:
        mean = latent.mean(0)
        var = latent.var(0, ddof=1)
    return -0.5 * jnp.sum(1.0 + jnp.log(var + 1e-10) - mean ** 2 - var)


class GATGraphSAGE(nn.Module):
    """Parameterized graph branch covering train.py + ablations 1-6.

    ======== ============================ =======================================
    preset    reference                    fields
    ======== ============================ =======================================
    model1    ``ablation/model1.py``       attention='gat10', dual_pool=True,
                                           dropout=0.2, sage_features=350
    model2    ``ablation/model 2.py``      attention='modified', residual=False,
                                           dual_pool=True, dropout=0.2
    model3    ``ablation/model 3.py``      + residual=True
    model4/5  ``ablation/model 4.py``      attention='modified', residual=True,
                                           dual_pool=False, dropout=0.3
    flagship  ``train.py:102-124``         same as model4 (fusion handled by
                                           :class:`HybridModel`)
    ======== ============================ =======================================
    """

    attention: str = "modified"        # 'modified' | 'gat10'
    residual: bool = True              # ModifiedGAT +V residual
    flat_attention: bool = False       # reference batch-global quirk mode
    dual_pool: bool = False            # cat(max, mean) vs max-only
    sage_features: int = 35
    fc_hidden: int = 1500
    output_dim: int = 128
    n_output: int = 1
    dropout: float = 0.3

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, adj: jnp.ndarray,
                 node_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        feat = nodes.shape[-1]
        if self.attention == "modified":
            x = ModifiedGATLayer(feat, residual=self.residual,
                                 flat=self.flat_attention,
                                 name="conv1")(nodes, node_mask)
        elif self.attention == "gat10":
            x = GATConv(feat, heads=10, name="conv1")(
                nodes, adj, node_mask, deterministic=deterministic)
        else:
            raise ValueError(self.attention)
        x = nn.relu(x)
        x = SAGEConv(self.sage_features, name="conv2")(x, adj, node_mask)
        x = nn.relu(x)
        if self.dual_pool:
            pooled = jnp.concatenate(
                [segment_max_pool(x, node_mask),
                 segment_mean_pool(x, node_mask)], axis=-1)
        else:
            pooled = segment_max_pool(x, node_mask)
        h = nn.relu(TorchLinear(self.fc_hidden, name="fc_g1")(pooled))
        h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = TorchLinear(self.output_dim, name="fc_g2")(h)
        return TorchLinear(self.n_output, name="out")(h)


class HybridModel(nn.Module):
    """The flagship M-GAT-GraphSAGE hybrid (reference ``train.py:212-246``):
    graph branch + fingerprint CNN branch fused by CombinedNet.  Returns
    ``(prediction [B,1], combined_latent [B, 1+fp_dim])`` — the latent feeds
    the KL regularizer (``train.py:245``)."""

    fp_dim: int = 1024
    cnn_fc_hidden: int = 256
    combined_hidden: int = 512
    graph_dropout: float = 0.3
    attention: str = "modified"
    residual: bool = True
    flat_attention: bool = False
    dual_pool: bool = False
    cnn_pallas_bwd: bool = False

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, adj: jnp.ndarray,
                 node_mask: jnp.ndarray, fp: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        graph_out = GATGraphSAGE(
            attention=self.attention, residual=self.residual,
            flat_attention=self.flat_attention, dual_pool=self.dual_pool,
            dropout=self.graph_dropout, name="gat_graphsage")(
                nodes, adj, node_mask, deterministic=deterministic)
        cnn_out = CNNNet(input_dim=self.fp_dim, output_dim=self.fp_dim,
                         fc_hidden=self.cnn_fc_hidden,
                         pallas_bwd=self.cnn_pallas_bwd, name="cnn")(
                             fp, deterministic=deterministic)
        latent = jnp.concatenate([graph_out, cnn_out], axis=-1)
        pred = CombinedNet(hidden_dim=self.combined_hidden, output_dim=1,
                           name="combined")(latent,
                                            deterministic=deterministic)
        return pred, latent


class GCNNet(nn.Module):
    """GCN baseline (reference ``gnn/gcn.py:42-66``): 3x GCNConv
    (xd -> xd -> 2xd -> 4xd), max-pool, FC 4xd->1024->1, dropout 0.1.

    Note: the reference trains this with the 5-dim raw featurizer but its
    predict script rebuilds with 35 dims (``gnn/predict-gcn.py:54``) — the
    two published scripts are incompatible.  We parameterize on the input
    feature count (both work) and default to 5 to match training."""

    num_features_xd: int = 5
    n_output: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, nodes, adj, node_mask, deterministic=True):
        xd = self.num_features_xd
        x = nn.relu(GCNConv(xd, name="conv1")(nodes, adj, node_mask))
        x = nn.relu(GCNConv(xd * 2, name="conv2")(x, adj, node_mask))
        x = nn.relu(GCNConv(xd * 4, name="conv3")(x, adj, node_mask))
        x = segment_max_pool(x, node_mask)
        x = nn.relu(TorchLinear(1024, name="fc_g1")(x))
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return TorchLinear(self.n_output, name="fc_g2")(x)


class SAGENet(nn.Module):
    """GraphSAGE baseline (reference ``gnn/graphsage.py:50-75``)."""

    output_dim: int = 128
    n_output: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, nodes, adj, node_mask, deterministic=True):
        feat = nodes.shape[-1]
        x = nn.Dropout(rate=self.dropout,
                       deterministic=deterministic)(nodes)
        x = nn.relu(SAGEConv(feat, name="sage1")(x, adj, node_mask))
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = SAGEConv(self.output_dim, name="sage2")(x, adj, node_mask)
        x = segment_max_pool(x, node_mask)
        x = nn.relu(TorchLinear(self.output_dim, name="fc_g1")(x))
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = nn.relu(TorchLinear(self.output_dim, name="fc_g2")(x))
        return TorchLinear(self.n_output, name="out")(x)


class GATNet(nn.Module):
    """Multi-head GAT baseline (reference ``gnn/gat.py:51-71``)."""

    output_dim: int = 128
    n_output: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, nodes, adj, node_mask, deterministic=True):
        feat = nodes.shape[-1]
        x = nn.Dropout(rate=self.dropout,
                       deterministic=deterministic)(nodes)
        x = nn.elu(GATConv(feat, heads=10, dropout=self.dropout,
                           name="gcn1")(x, adj, node_mask,
                                        deterministic=deterministic))
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = nn.relu(GATConv(self.output_dim, heads=1, dropout=self.dropout,
                            name="gcn2")(x, adj, node_mask,
                                         deterministic=deterministic))
        x = segment_max_pool(x, node_mask)
        x = nn.relu(TorchLinear(self.output_dim, name="fc_g1")(x))
        return TorchLinear(self.n_output, name="out")(x)


class GATGCN(nn.Module):
    """GAT+GCN baseline (reference ``gnn/gat-gcn.py:53-76``)."""

    output_dim: int = 128
    n_output: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, nodes, adj, node_mask, deterministic=True):
        feat = nodes.shape[-1]
        x = nn.relu(GATConv(feat, heads=10, name="conv1")(
            nodes, adj, node_mask, deterministic=deterministic))
        x = nn.relu(GCNConv(feat * 10, name="conv2")(x, adj, node_mask))
        pooled = jnp.concatenate([segment_max_pool(x, node_mask),
                                  segment_mean_pool(x, node_mask)], axis=-1)
        h = nn.relu(TorchLinear(1500, name="fc_g1")(pooled))
        h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = TorchLinear(self.output_dim, name="fc_g2")(h)
        return TorchLinear(self.n_output, name="out")(h)


class GINConvNet(nn.Module):
    """GIN baseline (reference ``gnn/gin.py:56-106``): 5x (GINConv -> ReLU
    -> BatchNorm), add-pool, FC 32->128->1024->256->1."""

    dim: int = 32
    n_output: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, nodes, adj, node_mask, deterministic=True):
        x = nodes
        for i in range(5):
            x = nn.relu(GINConv(self.dim, self.dim,
                                name=f"conv{i + 1}")(x, adj, node_mask))
            x = MaskedBatchNorm(name=f"bn{i + 1}")(
                x, node_mask, use_running_average=deterministic)
        x = segment_sum_pool(x, node_mask)
        x = nn.relu(TorchLinear(128, name="fc1_xd")(x))
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = nn.relu(TorchLinear(1024, name="fc1")(x))
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = nn.relu(TorchLinear(256, name="fc2")(x))
        return TorchLinear(self.n_output, name="out")(x)


class ChebNet(nn.Module):
    """ChebNet baseline (reference ``gnn/chebnet.py:75-96``) with the
    reference's custom pseudo-Laplacian recursion (see ChebConvRef)."""

    output_dim: int = 128
    n_output: int = 1
    cheb_k: int = 3
    dropout: float = 0.2

    @nn.compact
    def __call__(self, nodes, adj, node_mask, deterministic=True):
        x = nn.Dropout(rate=self.dropout,
                       deterministic=deterministic)(nodes)
        x = nn.elu(ChebConvRef(16, k=self.cheb_k,
                               name="conv1")(x, adj, node_mask))
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = nn.relu(ChebConvRef(self.output_dim, k=self.cheb_k,
                                name="conv2")(x, adj, node_mask))
        x = segment_max_pool(x, node_mask)
        x = nn.relu(TorchLinear(self.output_dim, name="fc_g1")(x))
        return TorchLinear(self.n_output, name="out")(x)
