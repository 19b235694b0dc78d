"""Config system + presets reproducing every reference training script.

The reference has no config system — every variant is a whole copied file
(6 ablations, 7 fingerprint swaps, 6 baselines; SURVEY.md §5).  One
dataclass + a preset registry collapses that ~10k LoC of duplication; each
preset cites the script it reproduces and carries its exact
hyperparameters.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

__all__ = ["TrainConfig", "PRESETS", "get_config"]


@dataclasses.dataclass
class TrainConfig:
    name: str = "flagship"
    model: str = "hybrid"          # hybrid | gat_graphsage | gcn | sage |
                                   # gat | gat_gcn | gin | cheb
    # graph-branch knobs (GATGraphSAGE axes)
    attention: str = "modified"    # modified | gat10
    residual: bool = True
    flat_attention: bool = False
    dual_pool: bool = False
    graph_dropout: float = 0.3
    sage_features: int = 35
    # data
    fingerprint: Optional[str] = "ecfp1024"
    featurizer: str = "35"         # "35" | "5"
    scale_targets: bool = True
    # CNN fc1 width: 256 in every reference script (train.py:133,
    # fingerprint/morgan=2048.py:125, maccs.py:125, ...) EXCEPT
    # fingerprint/ecfp=2024.py:125 which widens it to 512
    cnn_fc_hidden: int = 256
    # optimization (reference torch.optim.Adam semantics: L2-coupled wd)
    lr: float = 1e-3
    # opt-in lr schedule (the reference trains at constant lr,
    # train.py:209): "constant" | "warmup_cosine" = linear warmup over
    # warmup_steps, then cosine decay from lr to lr*lr_final_ratio over
    # the remaining epochs*steps_per_epoch optimizer steps.  Large-batch
    # configs are the intended user (bs-512 trains unstably at scaled
    # constant lr — SEED_REPEAT.json, RESULTS.md).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_final_ratio: float = 0.1
    weight_decay: float = 1e-4
    kl_lambda: float = 0.001
    epochs: int = 1000
    batch_size: int = 128
    eval_batch_size: int = 64
    seed: int = 42
    # selection: 'original_mse' (train.py:284) or 'val_mse' (baselines)
    select_metric: str = "original_mse"
    # MXU matmul precision: "bfloat16" = single-pass bf16 multiplies with
    # fp32 accumulation (fast TPU default); "float32" = highest-precision
    # multi-pass, for strict numeric-parity runs
    matmul_precision: str = "bfloat16"
    # Adam moment STORAGE dtype ("float32" | "bfloat16"): bf16 moments cut
    # the HBM-bound optimizer pass ~1.6x (arithmetic stays f32; see
    # train/optim.py).  Default float32 = exact torch-Adam trajectories.
    adam_moment_dtype: str = "float32"
    # Forward/backward COMPUTE dtype ("float32" | "bfloat16"): bf16 keeps
    # f32 master params + f32 gradients/optimizer but stores weights and
    # activations in bf16 inside the step, halving the fwd/bwd HBM weight
    # streams (the roofline bottleneck; see bench.py).  MXU accumulation
    # stays f32 (preferred_element_type) and attention softmax runs f32.
    # Default float32 = reference-parity numerics.
    compute_dtype: str = "float32"
    # Master parameter STORAGE dtype ("float32" | "bfloat16").  The
    # opt-in "bfloat16" mode (requires compute_dtype="bfloat16") stores
    # the ONE copy of the weights in bf16 and applies Adam updates with
    # STOCHASTIC ROUNDING (unbiased: E[round(x)] = x, so the quantizer
    # does not systematically zero small updates the way
    # round-to-nearest would).  This removes the separate f32 master
    # read+write and the bf16 working-copy write from the HBM-bound
    # optimizer pass — the last big stream in the step roofline
    # (docs/DESIGN.md; VERDICT r2 next #4).  Adam arithmetic stays f32.
    master_dtype: str = "float32"
    # Opt-in Adafactor-style FACTORED second moment for huge 2-D kernels
    # (>= 2^20 elements — in this model zoo, exactly the CNN fc1): the
    # v matrix is replaced by row/column f32 EMA vectors and the update
    # reconstructs outer(r, c)/mean(r) in registers.  Adam's first
    # moment, bias corrections, and update formula are unchanged; the
    # point is BYTES — v's read+write is 4 of the ~20 bytes/param the
    # traced fc1 grad+Adam fusion streams at ~96% of HBM peak
    # (train/optim.py, profiles/bf16_full_bs256_posmajor) — plus the
    # ~67-134 MB of HBM capacity v occupied.  MEASURED SLOWER at every
    # batch size (BENCH_STEP.json bf16_full_fv* rows: 2.013 vs 1.799
    # ms/step at bs 128; 103.4k vs 106.2k mol/s at bs 1024 — the
    # reconstruction breaks the fc1 grad+Adam fusion; docs/DESIGN.md
    # dead-end note), so this is an HBM-*capacity* mode, not a
    # throughput mode.  Changes the optimizer trajectory (rank-1 v
    # estimate), so it is OFF in every preset.
    adam_factored_v: bool = False
    # Activation rematerialization (jax.checkpoint around the forward
    # inside the grad): trades one extra forward's FLOPs for dropping
    # the saved activations from HBM — the standard lever for pushing
    # batch size past the memory ceiling on TPU.  Math is equivalent up
    # to float reassociation in the recomputed forward (~1e-7 relative;
    # pinned by test), so it is purely a memory/FLOPs dial.  Off by
    # default: at this model's size the
    # activations are small next to the 36M-param optimizer state, so
    # remat only pays at very large batch.
    remat: bool = False
    # Fused Pallas backward for the CNN branch (ops/pallas_cnn.py):
    # conv1->conv2->conv3->flatten->fc1 backward as two hand-tiled
    # kernels.  MEASURED SLOWER at the flagship shape (16.24 vs 9.64
    # ms/step at bf16 bs 1024, BENCH_STEP.json bf16_full_pl_bs1024):
    # XLA relays the conv-layout activations to pallas's fixed default
    # operand layout (~2.9 ms of copies) and Mosaic's matmul limits
    # force per-step operand merges that hold the chain kernel at ~3x
    # its roofline — full post-mortem in ops/pallas_cnn.py +
    # docs/DESIGN.md.  Kept as a parity-tested opt-in (gradients match
    # XLA AD to the bf16 noise floor; forward bit-identical).
    # Single-chip only: Trainer silently falls back to XLA AD under a
    # model-parallel mesh or for shapes outside
    # chain_shapes_supported.  OFF in every preset.
    cnn_pallas_bwd: bool = False
    # Device-resident dataset storage ("float32" | "compact").  The
    # epoch scan keeps the whole dataset in HBM; "compact" packs it
    # ~5.4x smaller (int8 one-hot nodes, uint8 edge indices, bit-packed
    # binary fingerprints, masks as atom/edge counts — data/packed.py;
    # measured 3.07 GB per 10^6 molecules, BENCH_SCALE_1M.json) and
    # unpacks per batch inside the scan.  Bit-exact: trajectories
    # are identical to float32 storage (tests/test_packed.py), so this
    # is purely a capacity dial — it lifts the one-chip ceiling from
    # ~7x10^5 to ~4x10^6 molecules at the flagship shape budget.
    dataset_storage: str = "float32"

    @property
    def is_hybrid(self) -> bool:
        return self.model == "hybrid"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def _p(**kw) -> TrainConfig:
    return TrainConfig(**kw)


PRESETS: Dict[str, TrainConfig] = {
    # --- flagship hybrid (reference train.py; == ablation model 6) ---
    "flagship": _p(name="flagship"),
    # reference-numerics mode: batch-global attention crossing molecule
    # boundaries (SURVEY §2.6 quirk; train.py:96-98)
    "flagship_flat": _p(name="flagship_flat", flat_attention=True),
    "model6": _p(name="model6"),
    # fast production config: flagship recipe with full mixed precision
    # (bf16 weight/activation storage + bf16 Adam moments, f32 master
    # params and gradients).  Same model/data/hyperparameters as
    # `flagship` — exists to document that the throughput mode bench.py
    # measures reaches the same test metrics (RESULTS.md)
    "flagship_bf16": _p(name="flagship_bf16", compute_dtype="bfloat16",
                        adam_moment_dtype="bfloat16"),
    # maximum-throughput config: bf16 master params updated with
    # stochastic rounding on top of flagship_bf16 (see master_dtype).
    # Exists so the HBM-mode's quality is a trained RESULTS row, not a
    # claim.
    "flagship_bf16sr": _p(name="flagship_bf16sr",
                          compute_dtype="bfloat16",
                          adam_moment_dtype="bfloat16",
                          master_dtype="bfloat16"),
    # large-batch throughput preset (VERDICT r3 next #1): the flagship
    # recipe relaxed to batch 256 — qualified by a 3-seed full-recipe
    # study (SEED_REPEAT.json): test RMSE 0.4629 +/- 0.0084, INSIDE the
    # f32-bs128 envelope (0.4602 +/- 0.0058) and better than
    # flagship_bf16@128 (0.4739 +/- 0.0040), at ~85k mol/s step rate
    # (BENCH_STEP.json bf16_full_bs256 row; 1.2x the bs-128 bf16
    # rate).  Eval batch stays the reference's 64.
    "flagship_bf16_bs256": _p(name="flagship_bf16_bs256",
                              compute_dtype="bfloat16",
                              adam_moment_dtype="bfloat16",
                              batch_size=256),
    # qualified large-batch preset (VERDICT r3 next #1): batch 512
    # with a sqrt-scaled lr (2e-3) under warmup(300)+cosine.  The
    # plain recipe at bs 512 degrades (RMSE 0.4726 +/- 0.0103 at lr
    # 1e-3, 0.4809 +/- 0.0144 at constant lr 2e-3 — SEED_REPEAT.json),
    # but the scheduled variant BEATS the f32-bs128 flagship: test RMSE
    # 0.4448 +/- 0.0112 vs 0.4602 +/- 0.0058 (3 seeds, full 1000-epoch
    # recipe).  Superseded as the production preset by
    # flagship_bf16_bs1024_wc below.  Eval batch stays the
    # reference's 64.
    "flagship_bf16_bs512_wc": _p(name="flagship_bf16_bs512_wc",
                                 compute_dtype="bfloat16",
                                 adam_moment_dtype="bfloat16",
                                 batch_size=512, lr=2e-3,
                                 lr_schedule="warmup_cosine",
                                 warmup_steps=300),
    # promoted production preset (round 4, re-promoted round 5): one
    # more doubling — batch 1024 under the same warmup(300)+cosine
    # schedule.  6-seed full-recipe test RMSE 0.4369 +/- 0.0028
    # (SEED_REPEAT.json ..._lr32 rows) — beats the f32-bs128 envelope
    # (0.4602 +/- 0.0058), bs512_wc (0.4448 +/- 0.0112), AND the
    # round-4 sqrt-scaled lr (0.4429 +/- 0.0123 over the same 6
    # seeds) — at the highest measured step rate (~106.2k mol/s,
    # BENCH_STEP.json bf16_full_bs1024 row).  Eval batch stays the
    # reference's 64.
    # lr history: promoted at the sqrt-scaled 2.83e-3 in round 4
    # (6-seed RMSE 0.4429 +/- 0.0123); round 5 swept the schedule and
    # re-promoted at 3.2e-3 — 6-seed RMSE 0.4369 +/- 0.0028, better
    # mean AND worst case (0.4413 vs 0.4633) at ~4x tighter seed
    # spread, identical step rate (SEED_REPEAT.json
    # flagship_bf16_bs1024_wc vs ..._lr32 rows; the old-lr rows stay
    # under the unsuffixed key as the history).  A deeper cosine floor
    # was an exact null (best checkpoint precedes the decay tails —
    # ..._floor20 rows).
    "flagship_bf16_bs1024_wc": _p(name="flagship_bf16_bs1024_wc",
                                  compute_dtype="bfloat16",
                                  adam_moment_dtype="bfloat16",
                                  batch_size=1024, lr=3.2e-3,
                                  lr_schedule="warmup_cosine",
                                  warmup_steps=300),
    # --- ablation ladder (reference ablation/model*.py) ---
    # ablation/model1.py:109-110 trains at batch 64/32, NOT the flagship's
    # 128/64 (VERDICT r2 missing #2)
    "model1": _p(name="model1", model="gat_graphsage", attention="gat10",
                 dual_pool=True, sage_features=350, graph_dropout=0.2,
                 fingerprint=None, scale_targets=False, lr=1e-4,
                 weight_decay=0.0, kl_lambda=0.0, batch_size=64,
                 eval_batch_size=32, select_metric="val_mse"),
    "model2": _p(name="model2", model="gat_graphsage", residual=False,
                 dual_pool=True, graph_dropout=0.2, fingerprint=None,
                 scale_targets=False, lr=5e-3, weight_decay=0.0,
                 kl_lambda=0.0, select_metric="val_mse"),
    "model3": _p(name="model3", model="gat_graphsage", residual=True,
                 dual_pool=True, graph_dropout=0.2, fingerprint=None,
                 scale_targets=False, lr=5e-3, weight_decay=0.0,
                 kl_lambda=0.0, select_metric="val_mse"),
    "model4": _p(name="model4", scale_targets=False, lr=5e-3,
                 weight_decay=0.0, kl_lambda=0.0, select_metric="val_mse"),
    "model5": _p(name="model5", scale_targets=False, lr=5e-3,
                 weight_decay=0.0, kl_lambda=0.001,
                 select_metric="val_mse"),
    # --- baselines (reference gnn/*.py) ---
    "gcn": _p(name="gcn", model="gcn", fingerprint=None, featurizer="5",
              scale_targets=False, lr=5.9e-4, weight_decay=0.0,
              kl_lambda=0.0, epochs=10, batch_size=32, eval_batch_size=32,
              graph_dropout=0.1, select_metric="val_mse"),
    "graphsage": _p(name="graphsage", model="sage", fingerprint=None,
                    scale_targets=False, lr=5e-3, weight_decay=0.0,
                    kl_lambda=0.0, graph_dropout=0.2,
                    select_metric="val_mse"),
    "gat": _p(name="gat", model="gat", fingerprint=None,
              scale_targets=False, lr=5e-3, weight_decay=0.0, kl_lambda=0.0,
              graph_dropout=0.2, select_metric="val_mse"),
    "gat_gcn": _p(name="gat_gcn", model="gat_gcn", fingerprint=None,
                  scale_targets=False, lr=1e-4, weight_decay=0.0,
                  kl_lambda=0.0, batch_size=64, eval_batch_size=32,
                  graph_dropout=0.2, select_metric="val_mse"),
    "gin": _p(name="gin", model="gin", fingerprint=None,
              scale_targets=False, lr=5e-3, weight_decay=0.0, kl_lambda=0.0,
              graph_dropout=0.2, select_metric="val_mse"),
    "chebnet": _p(name="chebnet", model="cheb", fingerprint=None,
                  scale_targets=False, lr=5e-3, weight_decay=0.0,
                  kl_lambda=0.0, graph_dropout=0.2,
                  select_metric="val_mse"),
    # --- fingerprint suite (reference fingerprint/*.py; flagship recipe
    #     with the CNN branch's fingerprint swapped) ---
    "morgan1024": _p(name="morgan1024", fingerprint="morgan1024"),
    "morgan2048": _p(name="morgan2048", fingerprint="morgan2048"),
    # ecfp=2024.py:125 is the ONLY script with the 512-wide CNN fc1;
    # morgan=2048.py:125 keeps 256 despite the same 2048-bit input
    "ecfp2048": _p(name="ecfp2048", fingerprint="ecfp2048",
                   cnn_fc_hidden=512),
    "fcfp": _p(name="fcfp", fingerprint="fcfp1024"),
    "maccs": _p(name="maccs", fingerprint="maccs"),
    "smifp": _p(name="smifp", fingerprint="smifp"),
    "bci": _p(name="bci", fingerprint="bci"),
}


def get_config(name: str, **overrides) -> TrainConfig:
    cfg = PRESETS[name]
    return cfg.replace(**overrides) if overrides else cfg
