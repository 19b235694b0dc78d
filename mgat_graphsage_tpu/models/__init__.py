"""Model zoo (flax.linen): flagship hybrid, baselines, ablation variants."""

from .layers import (
    CNNNet,
    CenterTapConv1d,
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
from .zoo import (
    ChebNet,
    GATGCN,
    GATGraphSAGE,
    GATNet,
    GCNNet,
    GINConvNet,
    HybridModel,
    SAGENet,
    kl_loss,
)

__all__ = [
    "CNNNet", "CenterTapConv1d", "ChebConvRef", "CombinedNet", "GATConv",
    "GCNConv", "GINConv", "MaskedBatchNorm", "ModifiedGATLayer", "SAGEConv",
    "TorchLinear", "ChebNet", "GATGCN", "GATGraphSAGE", "GATNet", "GCNNet",
    "GINConvNet", "HybridModel", "SAGENet", "kl_loss",
]
