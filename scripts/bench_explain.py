"""Benchmark the interpretability pipeline on the attached device
(VERDICT r1 #9): Stage-1 batched gradient importance at full test-set
scale (961 molecules) and Stage-3 GNNExplainer mask optimization at the
200-molecule detailed scale, reported as molecules/sec.

Reference point: the upstream pipeline runs BOTH stages one molecule at
a time with a fresh forward+backward per molecule
(``gnnexplainer.py:1414-1433`` and ``:661-690``); Stage 3 additionally
optimizes masks for 100 epochs per molecule.

Writes BENCH_EXPLAIN.json at the repo root when on TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mgat_graphsage_tpu.data import MolecularDataset, TEST_CSV, load_csv  # noqa: E402
from mgat_graphsage_tpu.explain.gradients import make_gradient_explainer  # noqa: E402
from mgat_graphsage_tpu.explain.gnnexplainer import make_gnn_explainer  # noqa: E402
from mgat_graphsage_tpu.models import GATGraphSAGE  # noqa: E402
from mgat_graphsage_tpu.ops import dense_adjacency  # noqa: E402


def main():
    batch = 64
    sm, y = load_csv(TEST_CSV)
    ds = MolecularDataset(sm, y, fingerprint=None, verbose=False)
    n_mol = len(ds)

    module = GATGraphSAGE()
    adj0 = dense_adjacency(jnp.asarray(ds.edges[:batch]),
                           jnp.asarray(ds.edge_mask[:batch]), ds.max_nodes)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0),
                                     jnp.asarray(ds.nodes[:batch]), adj0,
                                     jnp.asarray(ds.node_mask[:batch]))
    variables = jax.block_until_ready(variables)
    params = variables["params"]

    def graph_apply(nodes, adj, node_mask):
        return module.apply({"params": params}, nodes, adj, node_mask)

    def run_stage(explain, n, label, extra=()):
        # warm/compile on the first batch
        idx = np.arange(batch) % n_mol
        args = (jnp.asarray(ds.nodes[idx]), jnp.asarray(ds.edges[idx]),
                jnp.asarray(ds.edge_mask[idx]),
                jnp.asarray(ds.node_mask[idx])) + extra
        jax.block_until_ready(explain(*args))
        t0 = time.perf_counter()
        done = 0
        while done < n:
            take = np.arange(done, done + batch) % n_mol
            args = (jnp.asarray(ds.nodes[take]),
                    jnp.asarray(ds.edges[take]),
                    jnp.asarray(ds.edge_mask[take]),
                    jnp.asarray(ds.node_mask[take])) + extra
            jax.block_until_ready(explain(*args))
            done += batch
        dt = time.perf_counter() - t0
        rate = done / dt
        print(f"[bench_explain] {label}: {done} molecules in {dt:.2f}s "
              f"-> {rate:,.0f} mol/s", file=sys.stderr)
        return rate

    grad_explain = make_gradient_explainer(graph_apply)
    s1 = run_stage(grad_explain, n_mol, "stage1 gradient importance")

    gexp = make_gnn_explainer(graph_apply)
    s3 = run_stage(gexp, 200, "stage3 GNNExplainer (100-step mask opt)",
                   extra=(jax.random.PRNGKey(42),))

    result = {
        "backend": jax.default_backend(),
        "n_molecules": n_mol,
        "stage1_gradient_mol_per_s": round(s1, 1),
        "stage3_gnnexplainer_mol_per_s": round(s3, 1),
    }
    print(json.dumps(result, indent=2))
    if jax.default_backend() == "tpu":
        out = os.path.join(os.path.dirname(__file__), "..",
                           "BENCH_EXPLAIN.json")
        with open(out, "w") as fh:
            json.dump(result, fh, indent=2)
        print(f"wrote {os.path.abspath(out)}", file=sys.stderr)


if __name__ == "__main__":
    main()
