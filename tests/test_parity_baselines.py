"""Weight-for-weight parity: the six JAX baseline GNNs vs plain-torch
oracles of the reference math (VERDICT r1 missing #3).

Two levels of evidence per model:

1. **Forward parity** (eval mode): identical weights, real molecules,
   flat torch layout vs padded JAX layout, agreement to float32
   tolerance.
2. **Training-trajectory parity** (dropout disabled): identical init,
   identical batches, Adam with the reference hyperparameters; the loss
   sequences must track over 8 steps.  This adjudicates whether the
   anomalous trained-baseline metrics (graphsage r=.88/R2=.27,
   gat R2=-.99 in RESULTS.md) are faithful reference behavior or repo
   bugs: if the torch oracle shows the same trajectory, the behavior is
   the reference's own.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgat_graphsage_tpu.chem import smiles_to_graph
from mgat_graphsage_tpu.ops import dense_adjacency
from mgat_graphsage_tpu.train import get_config
from mgat_graphsage_tpu.train.trainer import build_model

torch = pytest.importorskip("torch")

from mgat_graphsage_tpu.compare.torch_ref import flat_batch  # noqa: E402
from mgat_graphsage_tpu.compare.torch_ref_gnn import (  # noqa: E402
    BASELINE_ORACLES,
    load_baseline_params,
)

SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "c1ccc(Cl)cc1",
    "CCN(CC)CCNC(=O)c1ccc(N)cc1",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "c1ccc2[nH]c(Sc3ccccc3)nc2c1",
    "CS(=O)(=O)c1ccc(F)cc1",
    "OCC1OC(O)C(O)C(O)C1O",
]
MAX_NODES, MAX_EDGES = 32, 80

# (preset name, model key, forward tolerance)
CASES = [
    ("graphsage", "sage", 2e-5),
    ("gat", "gat", 2e-5),
    ("gcn", "gcn", 2e-5),
    ("gat_gcn", "gat_gcn", 5e-5),
    ("gin", "gin", 5e-5),
    ("chebnet", "cheb", 5e-4),   # Cheb recursion amplifies f32 rounding
]


def _padded(smiles_list, featurizer="35"):
    b = len(smiles_list)
    feat_dim = 5 if featurizer == "5" else 35
    nodes = np.zeros((b, MAX_NODES, feat_dim), np.float32)
    edges = np.zeros((b, 2, MAX_EDGES), np.int32)
    node_mask = np.zeros((b, MAX_NODES), np.float32)
    edge_mask = np.zeros((b, MAX_EDGES), np.float32)
    graphs = []
    for i, smi in enumerate(smiles_list):
        feats, ei = smiles_to_graph(smi, featurizer=featurizer)
        graphs.append((feats, ei))
        nodes[i, :feats.shape[0]] = feats
        edges[i, :, :ei.shape[1]] = ei
        node_mask[i, :feats.shape[0]] = 1
        edge_mask[i, :ei.shape[1]] = 1
    return graphs, nodes, edges, node_mask, edge_mask


def _build_pair(preset, model_key, seed=0):
    cfg = get_config(preset, featurizer="35")
    model = build_model(cfg)
    graphs, nodes, edges, node_mask, edge_mask = _padded(SMILES)
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask),
                          MAX_NODES)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                    jnp.asarray(nodes), adj,
                                    jnp.asarray(node_mask))
    variables = jax.device_get(variables)
    tmodel = BASELINE_ORACLES[model_key](features=35)
    load_baseline_params(model_key, variables["params"],
                         variables.get("batch_stats", {}), tmodel)
    return (cfg, model, variables, tmodel, graphs,
            (nodes, edges, node_mask, edge_mask))


@pytest.mark.parametrize("preset,model_key,tol", CASES)
def test_baseline_forward_parity(preset, model_key, tol):
    (cfg, model, variables, tmodel, graphs,
     (nodes, edges, node_mask, edge_mask)) = _build_pair(preset, model_key)

    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask),
                          MAX_NODES)
    jax_out = np.asarray(model.apply(
        variables, jnp.asarray(nodes), adj, jnp.asarray(node_mask),
        deterministic=True)).reshape(-1)

    x, ei, batch_vec, ng, _ = flat_batch(
        graphs, [np.zeros((1, 1), np.float32)] * len(graphs))
    tmodel.eval()
    with torch.no_grad():
        t_out = tmodel(x, ei, batch_vec, ng).numpy().reshape(-1)

    np.testing.assert_allclose(jax_out, t_out, atol=tol, rtol=1e-4)


@pytest.mark.parametrize("preset,model_key", [
    ("graphsage", "sage"),      # adjudicates the r=.88/R2=.27 anomaly
    ("gat", "gat"),             # adjudicates the R2=-.99 anomaly
    ("gcn", "gcn"),
])
def test_baseline_training_trajectory_parity(preset, model_key):
    """8 Adam steps from identical init on identical batches (dropout
    off): losses must track to ~1e-3 relative."""
    import optax

    (cfg, _, variables, _, graphs,
     (nodes, edges, node_mask, edge_mask)) = _build_pair(preset, model_key)
    cfg = cfg.replace(graph_dropout=0.0)
    model = build_model(cfg)
    tmodel = BASELINE_ORACLES[model_key](features=35, dropout=0.0)
    load_baseline_params(model_key, variables["params"],
                         variables.get("batch_stats", {}), tmodel)

    y = np.linspace(4.0, 9.0, len(SMILES)).astype(np.float32)

    # --- JAX side ---
    tx = optax.chain(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                     optax.scale(-cfg.lr))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask),
                          MAX_NODES)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": bstats},
                              jnp.asarray(nodes), adj,
                              jnp.asarray(node_mask),
                              deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(0)},
                              mutable=["batch_stats"])
            (pred), new_vars = out
            mse = jnp.mean((pred.reshape(-1) - y) ** 2)
            return mse, new_vars.get("batch_stats", bstats)

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, \
            opt_state, loss

    jax_losses = []
    for _ in range(8):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
        jax_losses.append(float(loss))

    # --- torch side ---
    x, ei, batch_vec, ng, _ = flat_batch(
        graphs, [np.zeros((1, 1), np.float32)] * len(graphs))
    ty = torch.tensor(y).unsqueeze(-1)
    opt = torch.optim.Adam(tmodel.parameters(), lr=cfg.lr)
    tmodel.train()
    torch_losses = []
    for _ in range(8):
        opt.zero_grad()
        out = tmodel(x, ei, batch_vec, ng)
        loss = torch.nn.functional.mse_loss(out, ty)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    np.testing.assert_allclose(jax_losses, torch_losses,
                               rtol=2e-3, atol=2e-4)
