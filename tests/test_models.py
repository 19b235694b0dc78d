"""Model zoo tests: shapes, padding invariance, hand-computed layer math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgat_graphsage_tpu.models import (
    ChebNet,
    GATGCN,
    GATGraphSAGE,
    GATNet,
    GCNNet,
    GINConvNet,
    HybridModel,
    ModifiedGATLayer,
    SAGEConv,
    SAGENet,
    kl_loss,
)
from mgat_graphsage_tpu.ops import dense_adjacency


def _random_batch(key, b=4, n=16, e=40, f=35):
    k1, k2 = jax.random.split(key)
    nodes = jax.random.normal(k1, (b, n, f))
    # random valid node counts and chain edges
    node_mask = np.zeros((b, n), np.float32)
    edges = np.zeros((b, 2, e), np.int32)
    edge_mask = np.zeros((b, e), np.float32)
    rng = np.random.default_rng(0)
    for i in range(b):
        nv = int(rng.integers(4, n))
        node_mask[i, :nv] = 1
        k = 0
        for j in range(nv - 1):
            edges[i, :, k] = (j, j + 1)
            edges[i, :, k + 1] = (j + 1, j)
            k += 2
        edge_mask[i, :k] = 1
    nodes = nodes * node_mask[..., None]
    adj = dense_adjacency(jnp.array(edges), jnp.array(edge_mask), n)
    return nodes, adj, jnp.array(node_mask)


ALL_MODELS = [
    ("gcn", lambda: GCNNet(num_features_xd=35)),
    ("sage", SAGENet),
    ("gat", GATNet),
    ("gatgcn", GATGCN),
    ("gin", GINConvNet),
    ("cheb", ChebNet),
    ("hybrid_graph", GATGraphSAGE),
    ("model1", lambda: GATGraphSAGE(attention="gat10", dual_pool=True,
                                    sage_features=350, dropout=0.2)),
    ("model2", lambda: GATGraphSAGE(residual=False, dual_pool=True,
                                    dropout=0.2)),
    ("model3", lambda: GATGraphSAGE(residual=True, dual_pool=True,
                                    dropout=0.2)),
]


def _jit_apply(model):
    @jax.jit
    def fn(variables, nodes, adj, node_mask):
        return model.apply(variables, nodes, adj, node_mask,
                           mutable=["batch_stats"])[0]
    return fn


@pytest.mark.parametrize("name,ctor", ALL_MODELS)
def test_model_shapes(name, ctor):
    model = ctor()
    nodes, adj, node_mask = _random_batch(jax.random.PRNGKey(0))
    variables = model.init(jax.random.PRNGKey(1), nodes, adj, node_mask)
    out = _jit_apply(model)(variables, nodes, adj, node_mask)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


# padding invariance exercises the shared masking ops; a representative
# subset keeps suite runtime sane (attention, gcn-norm, batchnorm, cheb).
PAD_MODELS = [m for m in ALL_MODELS
              if m[0] in ("gcn", "gin", "cheb", "hybrid_graph", "model1")]


@pytest.mark.parametrize("name,ctor", PAD_MODELS)
def test_padding_invariance(name, ctor):
    """Doubling the node padding must not change model outputs."""
    model = ctor()
    nodes, adj, node_mask = _random_batch(jax.random.PRNGKey(0), n=16)
    variables = model.init(jax.random.PRNGKey(1), nodes, adj, node_mask)

    pad_n = 24
    nodes2 = jnp.pad(nodes, ((0, 0), (0, pad_n - 16), (0, 0)))
    adj2 = jnp.pad(adj, ((0, 0), (0, pad_n - 16), (0, pad_n - 16)))
    mask2 = jnp.pad(node_mask, ((0, 0), (0, pad_n - 16)))

    fn = _jit_apply(model)
    out1 = fn(variables, nodes, adj, node_mask)
    out2 = fn(variables, nodes2, adj2, mask2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-4, rtol=2e-4)


def test_sageconv_hand_math():
    """SAGE mean aggregation on a 3-node path graph, hand-computed."""
    # path 0-1-2; features scalar-ish
    nodes = jnp.array([[[1.0], [2.0], [4.0]]])
    adj = jnp.array([[[0.0, 1.0, 0.0],
                      [1.0, 0.0, 1.0],
                      [0.0, 1.0, 0.0]]])
    mask = jnp.ones((1, 3))
    conv = SAGEConv(1)
    variables = conv.init(jax.random.PRNGKey(0), nodes, adj, mask)
    # overwrite params with known values: lin_l.W=1,b=0; lin_r.W=1
    params = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    params["lin_l"]["bias"] = jnp.zeros_like(params["lin_l"]["bias"])
    out = conv.apply({"params": params}, nodes, adj, mask)
    # node0: mean(x1)=2 + x0=1 -> 3; node1: mean(1,4)=2.5+2=4.5; node2: 2+4=6
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), [3.0, 4.5, 6.0],
                               rtol=1e-6)


def test_modified_gat_flat_vs_per_graph_differ():
    """The flat (reference-quirk) mode must differ from per-molecule mode
    when the batch holds >1 molecule."""
    nodes, adj, node_mask = _random_batch(jax.random.PRNGKey(2), b=3, n=8)
    layer = ModifiedGATLayer(35)
    variables = layer.init(jax.random.PRNGKey(3), nodes, node_mask)
    flat_layer = ModifiedGATLayer(35, flat=True)
    out_per = layer.apply(variables, nodes, node_mask)
    out_flat = flat_layer.apply(variables, nodes, node_mask)
    assert out_per.shape == out_flat.shape
    diff = np.abs(np.asarray(out_per - out_flat))[
        np.asarray(node_mask) > 0]
    assert diff.max() > 1e-4


def test_modified_gat_flat_equals_per_graph_for_single_molecule():
    nodes, adj, node_mask = _random_batch(jax.random.PRNGKey(2), b=1, n=8)
    # make all nodes valid so flat==per-graph exactly
    node_mask = jnp.ones_like(node_mask)
    layer = ModifiedGATLayer(35)
    variables = layer.init(jax.random.PRNGKey(3), nodes, node_mask)
    out_per = layer.apply(variables, nodes, node_mask)
    out_flat = ModifiedGATLayer(35, flat=True).apply(
        variables, nodes, node_mask)
    np.testing.assert_allclose(np.asarray(out_per), np.asarray(out_flat),
                               atol=1e-5)


def test_kl_loss_matches_formula():
    rng = np.random.default_rng(0)
    latent = rng.normal(size=(32, 8)).astype(np.float32)
    got = float(kl_loss(jnp.array(latent)))
    mean = latent.mean(0)
    var = latent.var(0, ddof=1)
    expect = -0.5 * np.sum(1 + np.log(var + 1e-10) - mean ** 2 - var)
    np.testing.assert_allclose(got, expect, rtol=2e-4)
    # sample-masked version ignores padded rows
    masked = np.concatenate([latent, 100 * np.ones((4, 8), np.float32)])
    m = np.concatenate([np.ones(32), np.zeros(4)]).astype(np.float32)
    got_masked = float(kl_loss(jnp.array(masked), jnp.array(m)))
    np.testing.assert_allclose(got_masked, expect, rtol=2e-4)


def test_hybrid_model():
    nodes, adj, node_mask = _random_batch(jax.random.PRNGKey(0))
    fp = jax.random.bernoulli(jax.random.PRNGKey(5), 0.1,
                              (4, 1024)).astype(jnp.float32)
    model = HybridModel(fp_dim=1024)
    variables = model.init(jax.random.PRNGKey(1), nodes, adj, node_mask, fp)
    pred, latent = model.apply(variables, nodes, adj, node_mask, fp)
    assert pred.shape == (4, 1)
    assert latent.shape == (4, 1025)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables["params"]))
    # CNN fc1 dominates: 128*1024*256 ~ 33.5M params
    assert 30_000_000 < n_params < 40_000_000


def test_dropout_active_in_train_mode():
    nodes, adj, node_mask = _random_batch(jax.random.PRNGKey(0))
    model = SAGENet()
    variables = model.init(jax.random.PRNGKey(1), nodes, adj, node_mask)
    out_d = model.apply(variables, nodes, adj, node_mask,
                        deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(7)})
    out_e = model.apply(variables, nodes, adj, node_mask)
    assert np.abs(np.asarray(out_d - out_e)).max() > 1e-6


def test_cnn_bf16_matches_f32():
    """CNNNet under bf16 params/inputs must compute the same function
    as under f32 (to bf16 tolerance), with an identical param tree.
    (Both dtypes share ONE NWC path since the pos-major flatten landed;
    this also pins the fc1 kernel's 2-D [C*W, F] shape.)"""
    from mgat_graphsage_tpu.models import CNNNet

    model = CNNNet(input_dim=256, output_dim=256)
    fp = jax.random.bernoulli(jax.random.PRNGKey(3), 0.1,
                              (4, 256)).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), fp)
    # param tree unchanged: conv kernels [K, I, O], fc1 [C*W, F]
    params = variables["params"]
    assert params["conv1"]["kernel"].shape == (3, 1, 32)
    assert params["conv3"]["kernel"].shape == (3, 64, 128)
    assert params["fc1"]["kernel"].shape == (128 * 256, 256)
    assert params["fc1"]["bias"].shape == (256,)

    out_f32 = model.apply(variables, fp)
    p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16),
                                 variables)
    out_bf16 = model.apply(p16, fp.astype(jnp.bfloat16))
    assert out_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_bf16, np.float32),
                               np.asarray(out_f32), rtol=0.06, atol=0.3)


def test_torch_conv1d_ncw_equals_nwc():
    """TorchConv1d's NCW layout must equal its NWC layout on transposed
    inputs — same params, same math, different memory order."""
    from mgat_graphsage_tpu.models.layers import TorchConv1d

    x_nwc = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 8),
                              jnp.float32)
    mod = TorchConv1d(features=16)
    variables = mod.init(jax.random.PRNGKey(1), x_nwc)
    y_nwc = mod.apply(variables, x_nwc)
    y_ncw = mod.apply(variables, jnp.swapaxes(x_nwc, 1, 2), ncw=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(y_ncw, 1, 2)),
                               np.asarray(y_nwc), rtol=2e-5, atol=2e-6)
