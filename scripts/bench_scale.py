"""HBM-capacity scale benchmark: compact vs float32 device-resident
datasets (data/packed.py, ``TrainConfig.dataset_storage``).

The epoch-scan trainer keeps the whole dataset in HBM.  This measures,
on the real chip, (a) that ``dataset_storage="compact"`` does not slow
the step (the per-batch unpack is VPU-trivial next to the weight-bound
step), and (b) the capacity headline: dataset sizes whose plain float32
layout cannot fit a 16 GB v5e train fine packed.

Molecule count is scaled by tiling the bundled train split's featurized
arrays on the host (the chip doesn't care that rows repeat; the step
cost per molecule is shape-determined).  Host->device transfer happens
once and is reported separately from steady-state epoch time.

Usage (on the TPU):
  python scripts/bench_scale.py --sizes 16384 262144 --storage both
  python scripts/bench_scale.py --sizes 1000000 --storage compact
"""

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from mgat_graphsage_tpu.data import MolecularDataset, load_csv, TRAIN_CSV
from mgat_graphsage_tpu.data.packed import packed_nbytes, plain_nbytes
from mgat_graphsage_tpu.train import Trainer, get_config

GIB = 1024 ** 3


def tiled_dataset(base: MolecularDataset, n: int) -> MolecularDataset:
    """A dataset-shaped view with ``base``'s rows tiled to ``n``."""
    reps = -(-n // len(base))
    ds = copy.copy(base)
    for key in ("nodes", "edges", "node_mask", "edge_mask", "fp",
                "y", "y_orig"):
        v = getattr(base, key)
        setattr(ds, key, np.concatenate([v] * reps, axis=0)[:n])
    ds.n = n
    return ds


def bench_one(base, n, storage, batch_size, preset="flagship"):
    ds = tiled_dataset(base, n)
    plain_gb = plain_nbytes(ds) / GIB
    packed_gb = packed_nbytes(ds) / GIB
    over = dict(dataset_storage=storage)
    if batch_size is not None:
        over["batch_size"] = batch_size
    if preset == "flagship":
        # historical default rows: flagship shapes + bf16 step
        over.update(adam_moment_dtype="bfloat16", compute_dtype="bfloat16")
    cfg = get_config(preset, **over)
    batch_size = cfg.batch_size
    trainer = Trainer(cfg, ds, None)
    state = trainer.init_state()
    trainer._build_steps()

    t0 = time.perf_counter()
    data = jax.block_until_ready(trainer._device_dataset(ds))
    transfer_s = time.perf_counter() - t0

    rng = jax.random.PRNGKey(0)
    perm, smask = trainer._epoch_indices(n, batch_size,
                                         np.random.default_rng(0))
    n_steps = perm.shape[0]
    # compile + relay warmup with the exact epoch programme (scan trip
    # count is static, so a shorter warmup would compile a second time
    # inside the timed loop).  The state argument is donated — thread it.
    state, m = trainer._train_epoch_scan(state, perm, smask, rng, data)
    jax.block_until_ready(m)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = trainer._train_epoch_scan(state, perm, smask, rng,
                                             data)
        float(m)
        best = min(best, time.perf_counter() - t0)
    row = {
        "n_molecules": n, "storage": storage, "preset": preset,
        "batch_size": batch_size,
        "dataset_gb_plain": round(plain_gb, 3),
        "dataset_gb_packed": round(packed_gb, 3),
        "dataset_gb_resident": round(
            packed_gb if storage == "compact" else plain_gb, 3),
        "transfer_s": round(transfer_s, 2),
        "epoch_s": round(best, 3),
        "ms_per_step": round(best / n_steps * 1e3, 4),
        "mol_per_s": round(n_steps * batch_size / best, 1),
    }
    print(f"[bench_scale] n={n:>9,} {storage:8s} "
          f"resident={row['dataset_gb_resident']:.2f} GiB "
          f"xfer={transfer_s:.1f}s epoch={best:.2f}s "
          f"{row['ms_per_step']:.3f} ms/step {row['mol_per_s']:,.0f} mol/s",
          file=sys.stderr)
    # free the device dataset before the next size
    getattr(trainer, "_dev_cache", {}).clear()
    del data, trainer, state
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[16384, 262144])
    ap.add_argument("--storage", choices=["float32", "compact", "both"],
                    default="both")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="override the preset's batch size "
                         "(historical default rows used 128)")
    ap.add_argument("--preset", default="flagship",
                    help="train/config.py preset for the step program")
    ap.add_argument("--merge", action="store_true",
                    help="append rows to an existing --out file instead "
                         "of overwriting it")
    ap.add_argument("--out", default="BENCH_SCALE.json")
    args = ap.parse_args()
    if args.preset == "flagship" and args.batch_size is None:
        args.batch_size = 128  # preserve the historical default rows

    # Featurize with the preset's own fingerprint so e.g.
    # --preset ecfp2048 doesn't build a 2048-wide model against a
    # 1024-wide ds.fp (ADVICE r4).  Presets with fingerprint=None
    # (graph-only models) keep the historical ecfp1024 dataset — the
    # fp column is simply unused by their step.
    fingerprint = get_config(args.preset).fingerprint or "ecfp1024"
    sm, y = load_csv(TRAIN_CSV)
    base = MolecularDataset(sm, y, fit_scaler=True,
                            fingerprint=fingerprint, verbose=False)
    print(f"[bench_scale] base: {len(base)} molecules, "
          f"shapes N={base.max_nodes} E={base.max_edges}", file=sys.stderr)

    device = jax.devices()[0].device_kind
    rows = []
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("device", device) != device:
            print(f"[bench_scale] WARNING: merging into rows measured on "
                  f"{prev['device']!r} from a run on {device!r} — the "
                  f"merged file mixes devices", file=sys.stderr)
        rows = prev["rows"]
        for r in rows:  # legacy rows predate the "preset" key (ADVICE r4)
            r.setdefault("preset", "flagship")
    for n in args.sizes:
        modes = (["float32", "compact"] if args.storage == "both"
                 else [args.storage])
        for storage in modes:
            new = bench_one(base, n, storage, args.batch_size,
                            preset=args.preset)
            key = tuple(new[k] for k in
                        ("n_molecules", "storage", "preset", "batch_size"))
            rows = [r for r in rows
                    if tuple(r.get(k) for k in ("n_molecules", "storage",
                                                "preset", "batch_size"))
                    != key]  # newest measurement wins
            rows.append(new)

    out = {"device": device, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
