"""Train + test-evaluate a list of presets on the bundled splits,
appending results to a JSON file (feeds RESULTS.md)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mgat_graphsage_tpu.data import (
    MolecularDataset, TEST_CSV, TRAIN_CSV, VAL_CSV, load_csv)
from mgat_graphsage_tpu.eval.predict import predict_csv
from mgat_graphsage_tpu.train import Trainer, get_config


def run_preset(name: str, epochs, ckpt_root: str, results_path: str):
    cfg = get_config(name)
    if epochs is not None and cfg.epochs > epochs:
        cfg = cfg.replace(epochs=epochs)
    print(f"\n=== {name}: {cfg.epochs} epochs ===", flush=True)
    sm, y = load_csv(TRAIN_CSV)
    vs, vy = load_csv(VAL_CSV)
    train = MolecularDataset(sm, y, fit_scaler=cfg.scale_targets,
                             fingerprint=cfg.fingerprint,
                             featurizer=cfg.featurizer, verbose=False)
    val = MolecularDataset(vs, vy, scaler=train.scaler,
                           fingerprint=cfg.fingerprint,
                           featurizer=cfg.featurizer,
                           max_nodes=train.max_nodes,
                           max_edges=train.max_edges, verbose=False)
    ckpt_dir = os.path.join(ckpt_root, name)
    trainer = Trainer(cfg, train, val, ckpt_dir=ckpt_dir)
    t0 = time.time()
    trainer.fit(verbose=False)
    train_time = time.time() - t0
    ckpt = os.path.join(ckpt_dir, "best_model.msgpack")
    metrics, _ = predict_csv(ckpt, TEST_CSV, out_csv=None, verbose=False)
    row = {"preset": name, "epochs": cfg.epochs,
           "train_time_s": round(train_time, 1),
           "best_val_metric": round(trainer.best_metric, 4),
           **{k: round(v, 4) if isinstance(v, float) else v
              for k, v in metrics.items()}}
    print(json.dumps(row), flush=True)
    existing = []
    if os.path.exists(results_path):
        existing = json.load(open(results_path))
    existing = [r for r in existing if r["preset"] != name] + [row]
    with open(results_path, "w") as f:
        json.dump(existing, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("presets", nargs="+")
    ap.add_argument("--epochs", type=int, default=None,
                    help="cap epochs (presets keep their own if lower)")
    ap.add_argument("--ckpt-root", default="checkpoints")
    ap.add_argument("--results", default="RESULTS.json")
    args = ap.parse_args()
    for name in args.presets:
        try:
            run_preset(name, args.epochs, args.ckpt_root, args.results)
        except Exception as e:
            print(f"[{name}] FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
