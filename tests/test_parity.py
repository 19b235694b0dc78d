"""Numeric parity: JAX padded-dense path vs the PyTorch flat reference.

Loads identical weights into the flax HybridModel and the plain-torch
reimplementation of the reference math (``compare/torch_ref.py``) and
requires agreement to float32 tolerance.  This is the strongest
correctness evidence for the whole stack: ModifiedGAT's transposed-QK
attention + center-tap convs, SAGE mean aggregation, masked max-pooling,
the CNN's channel-major flatten, and the fusion head.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgat_graphsage_tpu.chem import smiles_to_graph
from mgat_graphsage_tpu.chem.fingerprints import get_ecfp
from mgat_graphsage_tpu.models import HybridModel
from mgat_graphsage_tpu.ops import dense_adjacency

torch = pytest.importorskip("torch")

from mgat_graphsage_tpu.compare.torch_ref import (  # noqa: E402
    TorchHybrid,
    flat_batch,
    load_jax_params_into_torch,
)

SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "c1ccc(Cl)cc1",
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "c1ccc2[nH]c(Sc3ccccc3)nc2c1",
]


def _padded_batch(smiles_list, max_nodes, max_edges):
    b = len(smiles_list)
    nodes = np.zeros((b, max_nodes, 35), np.float32)
    edges = np.zeros((b, 2, max_edges), np.int32)
    node_mask = np.zeros((b, max_nodes), np.float32)
    edge_mask = np.zeros((b, max_edges), np.float32)
    graphs, fps = [], []
    for i, smi in enumerate(smiles_list):
        feats, ei = smiles_to_graph(smi)
        fp = get_ecfp(smi)
        graphs.append((feats, ei))
        fps.append(fp)
        nodes[i, :feats.shape[0]] = feats
        edges[i, :, :ei.shape[1]] = ei
        node_mask[i, :feats.shape[0]] = 1
        edge_mask[i, :ei.shape[1]] = 1
    fp_arr = np.concatenate(fps).astype(np.float32)
    return graphs, fps, nodes, edges, node_mask, edge_mask, fp_arr


@pytest.fixture(scope="module")
def weights_and_data():
    graphs, fps, nodes, edges, node_mask, edge_mask, fp = _padded_batch(
        SMILES, max_nodes=32, max_edges=80)
    model_flat = HybridModel(fp_dim=1024, flat_attention=True)
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask), 32)
    variables = jax.jit(model_flat.init)(jax.random.PRNGKey(42),
                                         jnp.asarray(nodes), adj,
                                         jnp.asarray(node_mask),
                                         jnp.asarray(fp))
    variables = jax.block_until_ready(variables)
    tmodel = TorchHybrid()
    load_jax_params_into_torch(variables["params"], tmodel)
    tmodel.eval()
    return variables, tmodel, graphs, fps, (nodes, edges, node_mask,
                                            edge_mask, fp)


def test_flat_attention_parity(weights_and_data):
    """Batch-global (reference-quirk) mode vs torch flat layout."""
    variables, tmodel, graphs, fps, arrays = weights_and_data
    nodes, edges, node_mask, edge_mask, fp = arrays
    model = HybridModel(fp_dim=1024, flat_attention=True)
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask), 32)
    jpred, jlatent = model.apply(variables, jnp.asarray(nodes), adj,
                                 jnp.asarray(node_mask), jnp.asarray(fp))

    x, ei, batch_vec, ngraphs, tfp = flat_batch(graphs, fps)
    with torch.no_grad():
        tpred, tlatent = tmodel(x, ei, batch_vec, ngraphs, tfp)

    np.testing.assert_allclose(np.asarray(jpred),
                               tpred.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jlatent),
                               tlatent.numpy(), atol=3e-4, rtol=1e-3)


def test_per_molecule_mode_matches_reference_inference(weights_and_data):
    """Default per-molecule attention == the reference's own inference
    behavior (test.py evaluates one molecule per batch, so reference
    attention never crosses molecules at eval time, test.py:175-208)."""
    variables, tmodel, graphs, fps, arrays = weights_and_data
    nodes, edges, node_mask, edge_mask, fp = arrays
    model = HybridModel(fp_dim=1024, flat_attention=False)
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask), 32)
    jpred, _ = model.apply(variables, jnp.asarray(nodes), adj,
                           jnp.asarray(node_mask), jnp.asarray(fp))

    # torch: one molecule at a time (batch vector of zeros, like test.py)
    tpreds = []
    with torch.no_grad():
        for (feats, ei), fparr in zip(graphs, fps):
            x = torch.tensor(feats)
            e = torch.tensor(ei.astype(np.int64))
            b = torch.zeros(feats.shape[0], dtype=torch.long)
            p, _ = tmodel(x, e, b, 1, torch.tensor(fparr.astype(np.float32)))
            tpreds.append(float(p[0, 0]))

    np.testing.assert_allclose(np.asarray(jpred).reshape(-1),
                               np.asarray(tpreds), atol=3e-4, rtol=1e-3)


def test_flat_and_per_molecule_differ(weights_and_data):
    """Sanity: the quirk mode really changes numbers on a multi-molecule
    batch (otherwise the flag tests nothing)."""
    variables, tmodel, graphs, fps, arrays = weights_and_data
    nodes, edges, node_mask, edge_mask, fp = arrays
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask), 32)
    p_flat, _ = HybridModel(fp_dim=1024, flat_attention=True).apply(
        variables, jnp.asarray(nodes), adj, jnp.asarray(node_mask),
        jnp.asarray(fp))
    p_per, _ = HybridModel(fp_dim=1024, flat_attention=False).apply(
        variables, jnp.asarray(nodes), adj, jnp.asarray(node_mask),
        jnp.asarray(fp))
    assert np.abs(np.asarray(p_flat - p_per)).max() > 1e-6
