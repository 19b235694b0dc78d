"""End-to-end measurement of multi-bucket batching (VERDICT r2 next #7,
docs/DESIGN.md multi-bucket note): does routing molecules to node
buckets (N in {32, 48, 64, 80...}) beat one global worst-case padding
for a real training epoch?

Method: for each preset, time the trainer's fused whole-epoch scan on
(a) the full dataset at its global (max_nodes, max_edges) budget and
(b) one sub-dataset per bucket (same molecules, bucket-local budgets),
summing the per-bucket epoch times.  Both paths use the SAME trainer
machinery (dataset-on-device + lax.scan, one dispatch per epoch), so
the difference is purely the padding width.  Timing: full warmup epoch
per compiled program, then best-of-3 timed epochs (relay-settling
hygiene).

Writes BENCH_BUCKETS.json at the repo root when on TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from mgat_graphsage_tpu.data import MolecularDataset, TRAIN_CSV, load_csv  # noqa: E402
from mgat_graphsage_tpu.train import Trainer, get_config  # noqa: E402

BUCKETS = (32, 48, 64)


def time_epochs(trainer, repeats=3):
    state = trainer.init_state()
    key = jax.random.PRNGKey(0)
    state, _ = trainer.train_epoch(state, 0, key)   # warmup/compile
    jax.block_until_ready(state.params)
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        state, _ = trainer.train_epoch(state, r + 1, key)
        jax.block_until_ready(state.params)
        best = min(best, time.perf_counter() - t0)
    return best


def run_preset(name, sm, y):
    cfg = get_config(name, epochs=1)
    full = MolecularDataset(sm, y, fit_scaler=cfg.scale_targets,
                            fingerprint=cfg.fingerprint,
                            featurizer=cfg.featurizer, verbose=False)
    t_full = time_epochs(Trainer(cfg, full, None))

    plan = full.bucket_plan(BUCKETS)
    t_buckets = 0.0
    pops = []
    for bn, be, idx in plan:
        # array-slice view of the featurized dataset (no re-parse)
        sub = full.bucket_view(bn, be, idx)
        t_b = time_epochs(Trainer(cfg, sub, None))
        t_buckets += t_b
        pops.append({"nodes": int(bn), "edges": int(be),
                     "molecules": int(idx.size),
                     "epoch_s": round(t_b, 4)})
        print(f"[bench_buckets] {name}: bucket N={bn} E={be} "
              f"({idx.size} mol) epoch {t_b:.3f}s", file=sys.stderr)
    row = {
        "preset": name,
        "n_molecules": len(full),
        "global_budget": [int(full.max_nodes), int(full.max_edges)],
        "full_epoch_s": round(t_full, 4),
        "bucketed_epoch_s": round(t_buckets, 4),
        "speedup": round(t_full / t_buckets, 3),
        "buckets": pops,
    }
    print(f"[bench_buckets] {name}: full {t_full:.3f}s vs bucketed "
          f"{t_buckets:.3f}s -> {row['speedup']}x", file=sys.stderr)
    return row


def main():
    sm, y = load_csv(TRAIN_CSV)
    rows = [run_preset(n, sm, y) for n in ("graphsage", "flagship_bf16")]
    result = {"backend": jax.default_backend(), "buckets": list(BUCKETS),
              "presets": rows}
    print(json.dumps(result, indent=2))
    if jax.default_backend() == "tpu":
        out = os.path.join(os.path.dirname(__file__), "..",
                           "BENCH_BUCKETS.json")
        with open(out, "w") as fh:
            json.dump(result, fh, indent=2)
        print(f"wrote {os.path.abspath(out)}", file=sys.stderr)


if __name__ == "__main__":
    main()
