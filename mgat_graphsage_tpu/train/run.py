"""Command-line trainer: one entry point for every reference script.

``python -m mgat_graphsage_tpu.train.run --preset flagship`` reproduces
``python train.py``; ``--preset gcn`` reproduces ``gnn/gcn.py``; the
ablation/fingerprint presets map likewise (see train/config.py).
"""

from __future__ import annotations

import argparse
import os

from ..data import (
    MolecularDataset,
    TRAIN_CSV,
    VAL_CSV,
    load_csv,
)
from .config import PRESETS, get_config
from .trainer import Trainer


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="flagship", choices=sorted(PRESETS))
    ap.add_argument("--train-csv", default=TRAIN_CSV)
    ap.add_argument("--val-csv", default=VAL_CSV)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--limit", type=int, default=None,
                    help="limit training rows (smoke runs)")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--log", default=None, help="JSONL metrics log path")
    ap.add_argument("--resume", default=None, help="checkpoint to resume")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard batches over all local devices")
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="tensor-parallel ways on a (data, model) mesh")
    ap.add_argument("--fast-optimizer", action="store_true",
                    help="bf16 Adam moment storage (~10%% faster; "
                         "storage-only quantization, see train/optim.py)")
    ap.add_argument("--mixed-precision", action="store_true",
                    help="bf16 weight/activation storage in fwd+bwd "
                         "(f32 master params/grads/accumulation; "
                         "see TrainConfig.compute_dtype)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize activations in the backward "
                         "(jax.checkpoint) — memory for FLOPs, for "
                         "batch sizes past the HBM ceiling")
    ap.add_argument("--dataset-storage", default=None,
                    choices=["float32", "compact"],
                    help="device-resident dataset layout; 'compact' "
                         "packs ~5.3x smaller (bit-exact — data/"
                         "packed.py) for 10^6+-molecule datasets")
    ap.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed (multi-host; "
                         "coordinator via MGAT_* env vars)")
    args = ap.parse_args(argv)

    if args.distributed:
        from ..parallel import initialize_distributed

        initialize_distributed()

    overrides = {k: v for k, v in dict(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        seed=args.seed).items() if v is not None}
    if args.fast_optimizer:
        overrides["adam_moment_dtype"] = "bfloat16"
    if args.mixed_precision:
        overrides["compute_dtype"] = "bfloat16"
    if args.remat:
        overrides["remat"] = True
    if args.dataset_storage:
        overrides["dataset_storage"] = args.dataset_storage
    cfg = get_config(args.preset, **overrides)

    sm, y = load_csv(args.train_csv)
    vs, vy = load_csv(args.val_csv)
    if args.limit:
        sm, y = sm[:args.limit], y[:args.limit]
        vs, vy = vs[:max(args.limit // 4, 32)], vy[:max(args.limit // 4, 32)]

    train = MolecularDataset(sm, y, fit_scaler=cfg.scale_targets,
                             fingerprint=cfg.fingerprint,
                             featurizer=cfg.featurizer)
    val = MolecularDataset(vs, vy, scaler=train.scaler,
                           fingerprint=cfg.fingerprint,
                           featurizer=cfg.featurizer,
                           max_nodes=train.max_nodes,
                           max_edges=train.max_edges)

    ckpt_dir = os.path.join(args.ckpt_dir, cfg.name)
    mesh = None
    # --distributed implies a global mesh: without one, every process
    # would train an independent full copy of the model and race on the
    # checkpoint path
    if args.distributed or args.data_parallel or args.model_parallel > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(model_parallel=args.model_parallel)
    trainer = Trainer(cfg, train, val, ckpt_dir=ckpt_dir,
                      log_path=args.log, mesh=mesh)

    state, start_epoch = None, 0
    if args.resume:
        state, meta = trainer.load(args.resume)
        start_epoch = int(meta.get("epoch", 0))
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    final, best, history = trainer.fit(state=state, start_epoch=start_epoch)
    print(f"\nTraining completed, best "
          f"{cfg.select_metric}: {trainer.best_metric:.4f} "
          f"(normalized MSE {trainer.best_norm_mse:.4f})")
    print(f"Best checkpoint: {os.path.join(ckpt_dir, 'best_model.msgpack')}")


if __name__ == "__main__":
    main()
