"""Hand-computed semantics for conv layers without a torch oracle
(torch_geometric is not installed; these pin the PyG semantics we claim)."""

import numpy as np
import jax
import jax.numpy as jnp

from mgat_graphsage_tpu.models import ChebConvRef, GATConv, GCNConv, GINConv


def _path3():
    """Path graph 0-1-2, features = one-hots, no padding."""
    adj = jnp.array([[[0.0, 1.0, 0.0],
                      [1.0, 0.0, 1.0],
                      [0.0, 1.0, 0.0]]])
    x = jnp.array([[[1.0, 0.0, 0.0],
                    [0.0, 1.0, 0.0],
                    [0.0, 0.0, 1.0]]])
    mask = jnp.ones((1, 3))
    return x, adj, mask


def _set(params, path, value):
    node = params
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value
    return params


def test_gatconv_uniform_attention_mean():
    """Zero attention params -> uniform softmax over N(i)+{i}; with W=I
    the output is the neighborhood mean (checks self-loops, aggregation
    direction, masking)."""
    x, adj, mask = _path3()
    conv = GATConv(3, heads=1)
    variables = conv.init(jax.random.PRNGKey(0), x, adj, mask)
    p = jax.tree_util.tree_map(np.array, variables["params"])
    p["lin"]["kernel"] = np.eye(3, dtype=np.float32)
    p["att_src"] = np.zeros_like(p["att_src"])
    p["att_dst"] = np.zeros_like(p["att_dst"])
    p["bias"] = np.zeros_like(p["bias"])
    out = conv.apply({"params": p}, x, adj, mask)
    expect = np.array([
        [0.5, 0.5, 0.0],            # mean(x0, x1)
        [1 / 3, 1 / 3, 1 / 3],      # mean(x0, x1, x2)
        [0.0, 0.5, 0.5],            # mean(x1, x2)
    ])
    np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-6)


def test_gatconv_attention_prefers_high_score():
    """att params aligned with one feature make its holder dominate."""
    x, adj, mask = _path3()
    conv = GATConv(3, heads=1)
    variables = conv.init(jax.random.PRNGKey(0), x, adj, mask)
    p = jax.tree_util.tree_map(np.array, variables["params"])
    p["lin"]["kernel"] = np.eye(3, dtype=np.float32)
    # source score = 10 * x_j[0]: node 0 dominates wherever reachable
    p["att_src"] = np.array([[[10.0, 0.0, 0.0]]], np.float32)
    p["att_dst"] = np.zeros_like(p["att_dst"])
    p["bias"] = np.zeros_like(p["bias"])
    out = np.asarray(conv.apply({"params": p}, x, adj, mask)[0])
    # node 1 attends over {0,1,2}; j=0 has score 10 vs 0 -> weight ~1
    assert out[1, 0] > 0.99
    # node 2 cannot see node 0 (not adjacent): mass splits between 1,2
    assert out[2, 0] < 1e-6


def test_chebconv_ref_pseudo_laplacian():
    """out = (T0 + T1 + T2) x = (L + 2L^2) x with the reference's
    L = -(A + D) (gnn/chebnet.py:50-73), identity linear."""
    x, adj, mask = _path3()
    conv = ChebConvRef(3, k=3)
    variables = conv.init(jax.random.PRNGKey(0), x, adj, mask)
    p = jax.tree_util.tree_map(np.array, variables["params"])
    p["lin"]["kernel"] = np.eye(3, dtype=np.float32)
    p["lin"]["bias"] = np.zeros(3, np.float32)
    out = np.asarray(conv.apply({"params": p}, x, adj, mask)[0])

    A = np.asarray(adj[0])
    D = np.diag(A.sum(1))
    L = -(A + D)
    X = np.asarray(x[0])
    expect = X + L @ X + (2 * L @ L - np.eye(3)) @ X
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_ginconv_sum_aggregation():
    """GIN with identity MLP and eps=0: out = relu((1+0)x + sum_j x_j)
    passed through the second identity layer (nonneg inputs)."""
    x, adj, mask = _path3()
    conv = GINConv(3, 3)
    variables = conv.init(jax.random.PRNGKey(0), x, adj, mask)
    p = jax.tree_util.tree_map(np.array, variables["params"])
    p["mlp_0"]["kernel"] = np.eye(3, dtype=np.float32)
    p["mlp_0"]["bias"] = np.zeros(3, np.float32)
    p["mlp_1"]["kernel"] = np.eye(3, dtype=np.float32)
    p["mlp_1"]["bias"] = np.zeros(3, np.float32)
    out = np.asarray(conv.apply({"params": p}, x, adj, mask)[0])
    expect = np.array([
        [1.0, 1.0, 0.0],    # x0 + x1
        [1.0, 1.0, 1.0],    # x1 + (x0 + x2)
        [0.0, 1.0, 1.0],    # x2 + x1
    ])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_gcnconv_symmetric_normalization():
    """GCN on the path graph with identity weight: out = D^-1/2 (A+I)
    D^-1/2 x."""
    x, adj, mask = _path3()
    conv = GCNConv(3)
    variables = conv.init(jax.random.PRNGKey(0), x, adj, mask)
    p = jax.tree_util.tree_map(np.array, variables["params"])
    p["lin"]["kernel"] = np.eye(3, dtype=np.float32)
    # PyG adds bias AFTER aggregation; give it a nonzero value so the
    # placement is actually exercised
    p["bias"] = np.full(3, 0.25, np.float32)
    out = np.asarray(conv.apply({"params": p}, x, adj, mask)[0]) - 0.25
    A = np.asarray(adj[0]) + np.eye(3)
    dinv = np.diag(1 / np.sqrt(A.sum(1)))
    expect = dinv @ A @ dinv @ np.asarray(x[0])
    np.testing.assert_allclose(out, expect, atol=1e-6)
