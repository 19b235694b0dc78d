"""Warm batched-inference batch-scaling ladder (VERDICT r4 next #5).

The train side qualified its batch scaling (BENCH_STEP.json bs
128->1024); the inference side's committed evidence stopped at bs 512
(README "warm batched inference ~167k f32 / ~175k bf16").  This script
measures the same warm, on-device-data prediction scan
(``eval.predict.make_scan_predict`` — the exact program `Predictor`
and `predict_dataset` dispatch) across a batch ladder and writes
BENCH_INFER.json so the serving bucket ceiling can cite a measured
knee instead of a guess.

Methodology mirrors bench_step.py: data uploaded once, full warmup
dispatch (compile + relay settling), then best-of-3 timed runs of a
fixed ~16k-molecule epoch per batch size.  The molecule count is
identical across rows, so mol/s is directly comparable.

Reference point: the upstream evaluator predicts one molecule at a
time with a freshly zeroed batch vector (``test.py:175-208``).

Usage (on the TPU):
  python scripts/bench_infer.py --batches 256 512 1024 2048 4096
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mgat_graphsage_tpu.data import MolecularDataset, TRAIN_CSV, load_csv  # noqa: E402
from mgat_graphsage_tpu.data.synth import generate_dataset  # noqa: E402
from mgat_graphsage_tpu.train import Trainer, get_config  # noqa: E402
from mgat_graphsage_tpu.eval.predict import make_scan_predict  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[256, 512, 1024, 2048, 4096])
    ap.add_argument("--n", type=int, default=16384,
                    help="molecules per timed run (tiled to a multiple "
                         "of every batch size)")
    ap.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    ap.add_argument("--out", default="BENCH_INFER.json")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    sm, y = load_csv(TRAIN_CSV)
    sm, y = list(sm), list(y)
    if len(sm) < args.n:
        es, ey = generate_dataset(args.n - len(sm), seed=99)
        sm += es
        y += ey
    ds = MolecularDataset(sm[:args.n], y[:args.n], fit_scaler=True,
                          fingerprint="ecfp1024", verbose=False)
    n = len(ds)
    print(f"[bench_infer] {n} molecules, budget {ds.max_nodes} nodes / "
          f"{ds.max_edges} edges", file=sys.stderr)

    cfg = get_config("flagship")
    trainer = Trainer(cfg, ds, None)
    state = trainer.init_state()
    model = trainer.model
    scaler = ds.scaler

    data = jax.block_until_ready(trainer._device_dataset(ds))
    params = jax.block_until_ready(jax.device_put(state.params))
    batch_stats = jax.block_until_ready(
        jax.device_put(state.batch_stats or {}))

    rows = []
    for dtype in args.dtypes:
        infer_dtype = "bfloat16" if dtype == "bfloat16" else None
        scan_fn = make_scan_predict(model, cfg, scaler,
                                    infer_dtype=infer_dtype)
        for bs in args.batches:
            n_steps = -(-n // bs)
            perm = np.resize(np.arange(n), n_steps * bs) \
                .reshape(n_steps, bs).astype(np.int32)
            smask = np.ones((n_steps, bs), np.float32)
            tail = n_steps * bs - n
            if tail:
                smask[-1, bs - tail:] = 0.0
            perm_d = jnp.asarray(perm)
            smask_d = jnp.asarray(smask)

            def run():
                return jax.block_until_ready(
                    scan_fn(params, batch_stats, perm_d, smask_d, data))

            run()  # warmup: compile + relay settling
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            row = {"dtype": dtype, "batch_size": bs, "n_molecules": n,
                   "n_steps": n_steps,
                   "ms_per_batch": round(best / n_steps * 1e3, 4),
                   "mol_per_s": round(n / best, 1)}
            rows.append(row)
            print(f"[bench_infer] {dtype:8s} bs={bs:5d}: "
                  f"{row['ms_per_batch']:.3f} ms/batch "
                  f"{row['mol_per_s']:>10,.0f} mol/s", file=sys.stderr)

    out = {"device": jax.devices()[0].device_kind,
           "backend": jax.default_backend(),
           "n_molecules": n,
           "model": "flagship HybridModel (GAT_GraphSAGE + CNN, ecfp1024)",
           "rows": rows}
    print(json.dumps(out, indent=2))
    if jax.default_backend() == "tpu" and not args.no_write:
        path = os.path.join(os.path.dirname(__file__), "..", args.out)
        with open(path, "w") as fh:
            json.dump(out, fh, indent=2)
        print(f"wrote {os.path.abspath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
