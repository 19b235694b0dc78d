"""Isolated train-step time across precision configs (f32 parity,
bf16 Adam moments, full mixed precision), with the scan-probe done
right: the carry consumes every output, so nothing is DCE'd (the
round-1 pitfall that produced a bogus 1.27 ms/step).

Chains K steps in ONE jitted lax.scan dispatch over a fixed batch and
times the whole program; writes BENCH_STEP.json.

Usage (on the TPU):  python scripts/bench_step.py [--steps 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mgat_graphsage_tpu.data import MolecularDataset, load_csv, TRAIN_CSV
from mgat_graphsage_tpu.train import Trainer, get_config

CONFIGS = {
    "f32_parity": {},
    "bf16_moments": {"adam_moment_dtype": "bfloat16"},
    "bf16_full": {"adam_moment_dtype": "bfloat16",
                  "compute_dtype": "bfloat16"},
    # round 3 (VERDICT r2 next #4): bf16 master params + stochastic
    # rounding — removes the f32 master read/write and the bf16
    # working-copy write from the Adam pass
    "bf16_master_sr": {"adam_moment_dtype": "bfloat16",
                       "compute_dtype": "bfloat16",
                       "master_dtype": "bfloat16"},
    # round 4: Adafactor-style factored second moment on the 33.5M-param
    # CNN fc1 (train/optim.py) — drops v's read+write (4 of ~20
    # bytes/param) from the HBM-bound fc1 grad+Adam fusion.  MEASURED
    # SLOWER at every batch size (the reconstruction breaks the fusion;
    # docs/DESIGN.md dead-end note) — kept in the ladder as the record
    # of that negative.
    "bf16_full_fv": {"adam_moment_dtype": "bfloat16",
                     "compute_dtype": "bfloat16",
                     "adam_factored_v": True},
    # round 5: fused Pallas CNN backward (ops/pallas_cnn.py) — shapes
    # gate at batch >= 256, so bench at bs 256+ only
    "bf16_full_pl": {"adam_moment_dtype": "bfloat16",
                     "compute_dtype": "bfloat16",
                     "cnn_pallas_bwd": True},
}
# (a bf16 grad-storage variant measured identical to bf16_full —
# 2.465 vs 2.471 ms/step — XLA already fuses backward into the
# optimizer; the option was removed as a dead end)


def bench_config(name, overrides, ds, batch_size, n_steps):
    cfg = get_config("flagship", batch_size=batch_size, **overrides)
    trainer = Trainer(cfg, ds, None)
    state = trainer.init_state()
    if not hasattr(trainer, "_train_epoch_scan"):
        trainer._build_steps()
    rng = jax.random.PRNGKey(0)
    data = trainer._device_dataset(ds)
    perm, smask = trainer._epoch_indices(len(ds), batch_size,
                                         np.random.default_rng(0))
    # chain n_steps over the same epoch-permutation programme
    reps = (n_steps + perm.shape[0] - 1) // perm.shape[0]
    perm = jnp.asarray(np.concatenate([perm] * reps)[:n_steps])
    smask = jnp.asarray(np.concatenate([smask] * reps)[:n_steps])
    args = jax.block_until_ready((perm, smask, rng))
    # compile + warmup; _train_epoch_scan's carry consumes the step
    # output (state), so all n_steps execute
    state, m = trainer._train_epoch_scan(state, *args, data)
    jax.block_until_ready(m)
    # best-of-3: the first timed dispatch after a large compile can
    # still absorb tunnel/relay settling (observed 6-300x outliers)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = trainer._train_epoch_scan(state, *args, data)
        float(m)  # sync
        dt = min(dt, time.perf_counter() - t0)
    ms = dt / n_steps * 1e3
    mol_s = n_steps * batch_size / dt
    print(f"[bench_step] {name:14s} {ms:.3f} ms/step  "
          f"{mol_s:,.0f} mol/s  (loss={float(m):.4f})", file=sys.stderr)
    return {"config": name, "ms_per_step": round(ms, 4),
            "mol_per_s": round(mol_s, 1), "batch_size": batch_size,
            "n_steps": n_steps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--n-molecules", type=int, default=2048)
    ap.add_argument("--extra-batch-sizes", type=int, nargs="*",
                    default=[])
    ap.add_argument("--fv-batch-sizes", type=int, nargs="*", default=[],
                    help="also time bf16_full_fv (factored v) at these "
                         "batch sizes")
    ap.add_argument("--pl-batch-sizes", type=int, nargs="*", default=[],
                    help="also time bf16_full_pl (fused Pallas CNN "
                         "backward) at these batch sizes (>= 256)")
    ap.add_argument("--configs", nargs="*", default=None,
                    choices=sorted(CONFIGS),
                    help="subset of CONFIGS to run (default: all); "
                         "--out is only written when every config ran")
    ap.add_argument("--out", default="BENCH_STEP.json")
    args = ap.parse_args()

    sm, y = load_csv(TRAIN_CSV)
    ds = MolecularDataset(sm[:args.n_molecules], y[:args.n_molecules],
                          fit_scaler=True, fingerprint="ecfp1024",
                          verbose=False)
    chosen = args.configs or list(CONFIGS)
    rows = [bench_config(name, CONFIGS[name], ds, args.batch_size,
                         args.steps) for name in chosen]
    # throughput scaling beyond the reference's bs 128: amortizes the
    # (HBM-bound) optimizer pass over more molecules per step
    for bs in args.extra_batch_sizes:
        rows.append(bench_config(f"bf16_full_bs{bs}",
                                 CONFIGS["bf16_full"], ds, bs,
                                 args.steps))
    for bs in args.fv_batch_sizes:
        rows.append(bench_config(f"bf16_full_fv_bs{bs}",
                                 CONFIGS["bf16_full_fv"], ds, bs,
                                 args.steps))
    for bs in args.pl_batch_sizes:
        rows.append(bench_config(f"bf16_full_pl_bs{bs}",
                                 CONFIGS["bf16_full_pl"], ds, bs,
                                 args.steps))
    out = {"device": jax.devices()[0].device_kind, "rows": rows}
    if set(chosen) == set(CONFIGS):
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
