"""Gradient-based node importance — the primary importance engine.

Reference ``gnnexplainer.py:640-659`` (``simple_gradient_explanation``):
``x.requires_grad_()``, forward the graph branch, ``prediction.backward()``,
importance = per-atom L2 norm of d(pred)/d(x), then min-max normalized
(``process_node_importance``, ``gnnexplainer.py:692-721``).

TPU-first difference: the reference loops molecules one at a time (N=1
forward+backward per molecule, ``gnnexplainer.py:1414-1433``); here the
whole pass is ONE batched ``jax.grad`` per fixed-shape batch — the big
interpretability speedup promised in SURVEY.md §7.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dense_adjacency

__all__ = ["make_gradient_explainer", "process_node_importance"]


def process_node_importance(raw: np.ndarray,
                            num_atoms: int) -> np.ndarray:
    """Normalize an importance vector/matrix to per-atom [0, 1] scores
    (reference ``gnnexplainer.py:692-721``): feature matrices reduce to row
    L2 norms; pad/trim to ``num_atoms``; min-max scale; flat inputs (max ==
    min) fall back to 0.5 everywhere."""
    arr = np.asarray(raw, dtype=np.float64)
    if num_atoms <= 0:
        return np.zeros(0)
    if arr.ndim == 2:
        arr = np.linalg.norm(arr, axis=1)
    arr = arr.reshape(-1)
    if arr.shape[0] < num_atoms:
        arr = np.pad(arr, (0, num_atoms - arr.shape[0]))
    else:
        arr = arr[:num_atoms]
    lo, hi = float(arr.min()), float(arr.max())
    if hi - lo < 1e-12:
        return np.full(num_atoms, 0.5)
    return (arr - lo) / (hi - lo)


def make_gradient_explainer(graph_apply: Callable) -> Callable:
    """Build a jitted batched gradient explainer.

    ``graph_apply(nodes, adj, node_mask) -> [B, 1]`` must be a pure
    function closed over parameters (eval mode).

    Returns ``explain(nodes, edges, edge_mask, node_mask) ->
    (raw_importance [B, N], predictions [B])`` where raw importance is the
    per-atom gradient L2 norm (un-normalized; callers apply
    :func:`process_node_importance` per molecule).
    """

    @jax.jit
    def explain(nodes, edges, edge_mask, node_mask):
        adj = dense_adjacency(edges, edge_mask, nodes.shape[1])

        def scalar_sum(x):
            # d(sum_b pred_b)/dx gives each molecule's own gradient since
            # predictions are independent across the batch
            return graph_apply(x, adj, node_mask).sum()

        grads = jax.grad(scalar_sum)(nodes)              # [B, N, F]
        raw = jnp.linalg.norm(grads, axis=-1) * node_mask  # [B, N]
        preds = graph_apply(nodes, adj, node_mask).reshape(-1)
        return raw, preds

    return explain
