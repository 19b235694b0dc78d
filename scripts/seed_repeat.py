"""Seed-repeat study: flagship f32 vs flagship_bf16 across 3 seeds
(VERDICT r2 next #6 — the round-2 claim that the bf16 production config
"reaches the same test metrics" rested on one run per config; this
gives the claim error bars).

Trains {flagship, flagship_bf16} x seeds {42, 43, 44} with the full
reference recipe, evaluates each on the independent test split, and
writes SEED_REPEAT.json {config: [per-seed metric rows]} plus a
mean +/- spread summary to stderr.

Round-4 extension (VERDICT r3 next #1): ``--presets`` / ``--set`` /
``--label`` / ``--merge`` let the same harness qualify config variants
(e.g. the large-batch throughput path ``flagship_bf16 --set
batch_size=512``) and merge their rows into the existing artifact
without re-running the base study.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from mgat_graphsage_tpu.data import (  # noqa: E402
    MolecularDataset, TEST_CSV, TRAIN_CSV, VAL_CSV, load_csv)
from mgat_graphsage_tpu.eval.predict import predict_csv  # noqa: E402
from mgat_graphsage_tpu.train import Trainer, get_config  # noqa: E402

SEEDS = (42, 43, 44)
PRESETS = ("flagship", "flagship_bf16")


def _parse_override(kv: str):
    key, _, raw = kv.partition("=")
    if not _:
        raise SystemExit(f"--set expects key=value, got {kv!r}")
    for cast in (int, float):
        try:
            return key, cast(raw)
        except ValueError:
            pass
    if raw in ("true", "false", "True", "False"):
        return key, raw.lower() == "true"
    return key, raw


def run_one(preset: str, seed: int, epochs, ckpt_root: str,
            overrides=None, label=None):
    cfg = get_config(preset, seed=seed)
    if overrides:
        cfg = cfg.replace(**overrides)
    if epochs is not None and cfg.epochs > epochs:
        cfg = cfg.replace(epochs=epochs)
    sm, y = load_csv(TRAIN_CSV)
    vs, vy = load_csv(VAL_CSV)
    train = MolecularDataset(sm, y, fit_scaler=True,
                             fingerprint=cfg.fingerprint, verbose=False)
    val = MolecularDataset(vs, vy, scaler=train.scaler,
                           fingerprint=cfg.fingerprint,
                           max_nodes=train.max_nodes,
                           max_edges=train.max_edges, verbose=False)
    label = label or preset
    ckpt_dir = os.path.join(ckpt_root, f"{label}_seed{seed}")
    trainer = Trainer(cfg, train, val, ckpt_dir=ckpt_dir)
    t0 = time.time()
    trainer.fit(verbose=False)
    metrics, _ = predict_csv(os.path.join(ckpt_dir, "best_model.msgpack"),
                             TEST_CSV, out_csv=None, verbose=False)
    row = {"preset": label, "seed": seed, "epochs": cfg.epochs,
           "batch_size": cfg.batch_size, "lr": cfg.lr,
           "train_time_s": round(time.time() - t0, 1),
           **{k: round(v, 4) if isinstance(v, float) else v
              for k, v in metrics.items()}}
    print(f"[seed_repeat] {json.dumps(row)}", file=sys.stderr, flush=True)
    return row


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--ckpt-root", default="/tmp/seed_repeat_ckpts")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "SEED_REPEAT.json"))
    ap.add_argument("--presets", default=None,
                    help="comma-separated preset list (default: "
                    "flagship,flagship_bf16)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE",
                    help="TrainConfig override applied to every preset "
                    "(repeatable), e.g. --set batch_size=512")
    ap.add_argument("--label", default=None,
                    help="results key for the (single) preset when "
                    "overrides are applied, e.g. flagship_bf16_bs512")
    ap.add_argument("--merge", action="store_true",
                    help="merge rows into an existing --out file instead "
                    "of overwriting it")
    ap.add_argument("--seeds", default=None,
                    help="comma-separated seed list (default 42,43,44)")
    args = ap.parse_args()

    seeds = (tuple(int(s) for s in args.seeds.split(","))
             if args.seeds else SEEDS)
    presets = tuple(args.presets.split(",")) if args.presets else PRESETS
    overrides = dict(_parse_override(kv) for kv in args.overrides)
    if args.label and len(presets) != 1:
        raise SystemExit("--label requires exactly one --presets entry")

    results = {}
    for preset in presets:
        label = args.label or preset
        results[label] = [
            run_one(preset, s, args.epochs, args.ckpt_root,
                    overrides=overrides, label=label) for s in seeds]

    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        merged = dict(prior.get("results", {}))
        merged.update(results)
        results = merged

    summary = {}
    for preset, rows in results.items():
        for key in ("mse", "rmse", "pearson_r"):
            vals = np.array([r[key] for r in rows])
            summary[f"{preset}.{key}"] = {
                "mean": round(float(vals.mean()), 4),
                "std": round(float(vals.std(ddof=1)), 4),
                "min": round(float(vals.min()), 4),
                "max": round(float(vals.max()), 4),
            }
    out = {"seeds": list(seeds), "results": results, "summary": summary}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    for k, v in summary.items():
        print(f"[seed_repeat] {k}: {v['mean']} +/- {v['std']} "
              f"(range {v['min']}..{v['max']})", file=sys.stderr)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
