"""The jitted training engine.

Replaces the reference's per-script epoch loops (``train.py:229-298``,
``gnn/graphsage.py:117-144``) with ONE engine:

- a single jitted ``train_step`` (forward + loss + backward + Adam update,
  donated state) and jitted ``eval_step`` — the whole step is one XLA
  program per batch shape, so per-step Python overhead is a dict lookup;
- torch-``optim.Adam`` semantics: L2-coupled weight decay applied to the
  gradient *before* the moment updates (``optax.add_decayed_weights``
  chained ahead of ``scale_by_adam``), matching ``train.py:216-222``;
- loss = masked MSE + lambda_KL * KL over the combined latent for hybrid
  configs (``train.py:244-246``), plain MSE otherwise;
- per-epoch validation with best-checkpoint selection on either the
  normalized-MSE or the original-scale MSE (``train.py:284``), replicating
  the reference's mean-of-per-batch-MSEs quirk (``train.py:278``);
- data-parallel execution over a ``jax.sharding.Mesh``: batches sharded on
  the ``data`` axis, params replicated; XLA inserts the gradient
  all-reduce (SPMD) — this is the TPU-native replacement for the
  reference's absent distributed layer (SURVEY.md §2.4);
- checkpoint/resume (reference saves only; SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .optim import torch_adam_sr_update
from flax import struct
from flax.core import unfreeze

from ..data import GraphBatch, MolecularDataset
from ..data.packed import gather_batch, pack_dataset
from ..models import (
    ChebNet,
    GATGCN,
    GATGraphSAGE,
    GATNet,
    GCNNet,
    GINConvNet,
    HybridModel,
    SAGENet,
    kl_loss,
)
from ..chem.fingerprints import FINGERPRINT_DIMS
from ..ops import dense_adjacency
from ..parallel import make_mesh, replicate, shard_batch, shard_state
from .checkpoint import load_checkpoint, save_checkpoint
from .config import TrainConfig

__all__ = ["TrainState", "Trainer", "build_model", "make_optimizer"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_model(cfg: TrainConfig):
    """Config -> flax module (the reference's 15 copy-pasted model classes
    collapse into this registry)."""
    if cfg.model == "hybrid":
        fp_dim = FINGERPRINT_DIMS[cfg.fingerprint]
        return HybridModel(
            fp_dim=fp_dim,
            cnn_fc_hidden=cfg.cnn_fc_hidden,
            attention=cfg.attention, residual=cfg.residual,
            flat_attention=cfg.flat_attention, dual_pool=cfg.dual_pool,
            graph_dropout=cfg.graph_dropout,
            cnn_pallas_bwd=cfg.cnn_pallas_bwd)
    if cfg.model == "gat_graphsage":
        return GATGraphSAGE(
            attention=cfg.attention, residual=cfg.residual,
            flat_attention=cfg.flat_attention, dual_pool=cfg.dual_pool,
            sage_features=cfg.sage_features, dropout=cfg.graph_dropout)
    if cfg.model == "gcn":
        return GCNNet(num_features_xd=5 if cfg.featurizer == "5" else 35,
                      dropout=cfg.graph_dropout)
    if cfg.model == "sage":
        return SAGENet(dropout=cfg.graph_dropout)
    if cfg.model == "gat":
        return GATNet(dropout=cfg.graph_dropout)
    if cfg.model == "gat_gcn":
        return GATGCN(dropout=cfg.graph_dropout)
    if cfg.model == "gin":
        return GINConvNet(dropout=cfg.graph_dropout)
    if cfg.model == "cheb":
        return ChebNet(dropout=cfg.graph_dropout)
    raise ValueError(f"unknown model {cfg.model!r}")


def _lr_schedule(cfg: TrainConfig, total_steps: int):
    """cfg -> constant float lr, or a jittable count->lr schedule.

    ``warmup_cosine``: linear warmup over ``cfg.warmup_steps`` steps,
    then cosine decay from ``cfg.lr`` down to
    ``cfg.lr * cfg.lr_final_ratio`` across the remaining
    ``total_steps``.  The reference trains at constant lr
    (``train.py:209``); schedules are this framework's opt-in extension
    for large-batch configs."""
    if cfg.lr_schedule == "constant":
        return cfg.lr
    if cfg.lr_schedule != "warmup_cosine":
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r} "
                         "(expected 'constant' or 'warmup_cosine')")
    warm = max(int(cfg.warmup_steps), 1)
    floor = cfg.lr * cfg.lr_final_ratio
    span = max(int(total_steps) - warm, 1)

    def sched(count):  # count: 1-based f32 optimizer step
        wlr = cfg.lr * jnp.minimum(count / warm, 1.0)
        prog = jnp.clip((count - warm) / span, 0.0, 1.0)
        clr = floor + 0.5 * (cfg.lr - floor) * (1.0 + jnp.cos(
            jnp.pi * prog))
        return jnp.where(count <= warm, wlr, clr)

    return sched


def make_optimizer(cfg: TrainConfig,
                   total_steps: int = 0) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay): L2 folded into the gradient
    before the Adam moments (NOT decoupled AdamW).  Single-pass fused
    implementation with configurable moment storage dtype
    (see train/optim.py for the measured HBM analysis).  With
    ``cfg.lr_schedule != 'constant'``, ``total_steps`` sizes the decay
    (the Trainer passes epochs x steps-per-epoch)."""
    from .optim import torch_adam

    return torch_adam(_lr_schedule(cfg, total_steps),
                      weight_decay=cfg.weight_decay,
                      moment_dtype=cfg.adam_moment_dtype,
                      factored_v_min_size=(1 << 20)
                      if cfg.adam_factored_v else 0)


def _masked_mse(pred, target, sample_mask):
    err = (pred.reshape(-1) - target.reshape(-1)) ** 2
    return (err * sample_mask).sum() / jnp.maximum(sample_mask.sum(), 1.0)


class Trainer:
    """End-to-end training driver for any config preset."""

    def __init__(self, cfg: TrainConfig, train_ds: MolecularDataset,
                 val_ds: Optional[MolecularDataset] = None,
                 mesh: Optional[Any] = None,
                 use_mesh: bool = False,
                 ckpt_dir: Optional[str] = None,
                 log_path: Optional[str] = None):
        if cfg.master_dtype == "bfloat16" and \
                cfg.compute_dtype != "bfloat16":
            raise ValueError(
                "master_dtype='bfloat16' requires compute_dtype="
                "'bfloat16' (the bf16 master IS the compute copy)")
        if cfg.adam_factored_v and cfg.master_dtype == "bfloat16":
            raise ValueError(
                "adam_factored_v is not supported with master_dtype="
                "'bfloat16' (the fused SR update path keeps a full v)")
        self.cfg = cfg
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.mesh = mesh or (make_mesh() if use_mesh else None)
        if cfg.cnn_pallas_bwd and self.mesh is not None:
            # the fused CNN backward's pallas_call has no GSPMD
            # partitioning rule — fall back to XLA AD under a mesh
            cfg = cfg.replace(cnn_pallas_bwd=False)
            self.cfg = cfg
        self.model = build_model(cfg)
        steps_per_epoch = max(
            -(-len(train_ds) // cfg.batch_size), 1)
        self._total_steps = cfg.epochs * steps_per_epoch
        self.tx = make_optimizer(cfg, total_steps=self._total_steps)
        self._lr = _lr_schedule(cfg, self._total_steps)
        self.ckpt_dir = ckpt_dir
        self.log_path = log_path
        self.scaler = train_ds.scaler
        self._train_step = None
        self._eval_step = None
        self.history: List[Dict] = []

    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        batch = next(self.train_ds.batches(cfg.batch_size))
        n = batch.nodes.shape[1]

        @jax.jit
        def _init(rng, nodes, edges, edge_mask, node_mask, fp):
            adj = dense_adjacency(edges, edge_mask, n)
            if cfg.is_hybrid:
                return self.model.init(rng, nodes, adj, node_mask, fp)
            return self.model.init(rng, nodes, adj, node_mask)

        variables = _init(rng, jnp.asarray(batch.nodes),
                          jnp.asarray(batch.edges),
                          jnp.asarray(batch.edge_mask),
                          jnp.asarray(batch.node_mask),
                          jnp.asarray(batch.fp))
        # materialize before feeding into downstream jits: the axon TPU
        # relay can deadlock host readback when a jit consumes another
        # jit's not-yet-materialized outputs
        variables = jax.block_until_ready(variables)
        params = unfreeze(variables["params"])
        if cfg.master_dtype == "bfloat16":
            # bf16 master storage: init in f32 (flax default) then
            # quantize ONCE; every later update is stochastically
            # rounded inside the fused Adam pass
            # (train/optim.py::torch_adam_sr_update)
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
        batch_stats = unfreeze(variables.get("batch_stats", {}))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=self.tx.init(params))
        if self.mesh is not None:
            # DP: everything replicated.  With a >1 `model` axis, big 2-D
            # kernels (the hybrid's 33.5M-param CNN fc1) and their Adam
            # moments are column-sharded across it (tensor parallelism) —
            # XLA partitions the matmuls and optimizer update to match.
            state = shard_state(state, self.mesh)
        return state

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg, model, tx = self.cfg, self.model, self.tx
        is_hybrid = cfg.is_hybrid
        kl_lambda = cfg.kl_lambda
        mean = jnp.float32(self.scaler.mean_)
        scale = jnp.float32(self.scaler.scale_)

        # Static fingerprint width for the compact-storage unpack (bit-
        # packing rounds the byte axis up; data/packed.py::gather_batch)
        fp_dim = self.train_ds.fp.shape[1]

        # Data-parallel SPMD: batches gathered on device inside the epoch
        # scan are constrained to the mesh's `data` axis, so XLA partitions
        # the model compute per-device and inserts the gradient all-reduce.
        # The fused whole-epoch scan therefore IS the multi-chip path (one
        # dispatch per epoch on 1 or N chips) — no per-step host loop.
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            _batch_sharding = NamedSharding(self.mesh,
                                            PartitionSpec("data"))

            def constrain(batch):
                return {
                    k: jax.lax.with_sharding_constraint(v, _batch_sharding)
                    for k, v in batch.items()}
        else:
            def constrain(batch):
                return batch

        # 'float32' -> highest-precision MXU passes (parity runs);
        # 'bfloat16' -> single-pass bf16 multiplies with fp32 accumulate
        # (the fast TPU default).
        matmul_prec = ("highest" if cfg.matmul_precision == "float32"
                       else "default")
        # compute_dtype='bfloat16': full mixed precision — f32 master
        # params/optimizer, bf16 weight/activation storage inside the
        # forward+backward (halves the HBM weight streams that dominate
        # this 36M-param step; accumulation stays f32 via
        # preferred_element_type in every layer).  Loss/KL/metrics and
        # gradients remain f32 (the cast's transpose upcasts).
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        master_bf16 = cfg.master_dtype == "bfloat16"

        def _cast_tree(t, dt):
            return jax.tree_util.tree_map(
                lambda a: a.astype(dt) if a.dtype in (jnp.float32,
                                                      jnp.bfloat16) else a,
                t)

        def forward(params, batch_stats, batch, rng, train: bool):
            return jax.default_matmul_precision(matmul_prec)(
                _forward_inner)(params, batch_stats, batch, rng, train)

        def _forward_inner(params, batch_stats, batch, rng, train: bool):
            n = batch["nodes"].shape[1]
            adj = dense_adjacency(batch["edges"], batch["edge_mask"], n)
            # exclude duplicate rows padding the final partial batch from
            # every cross-sample computation (MaskedBatchNorm statistics,
            # flat-mode cross-molecule attention): the reference's final
            # batch is simply smaller, so padded rows must be inert.  All
            # mask-aware ops return zeros (not NaN/-inf) on fully-masked
            # graphs, so this is safe.
            node_mask = batch["node_mask"] * batch["sample_mask"][:, None]
            nodes, fp = batch["nodes"], batch.get("fp")
            if cdt is not None:
                params = _cast_tree(params, cdt)
                adj = adj.astype(cdt)
                node_mask = node_mask.astype(cdt)
                nodes = nodes.astype(cdt)
                fp = None if fp is None else fp.astype(cdt)
            variables = {"params": params, "batch_stats": batch_stats}
            kwargs = dict(deterministic=not train)
            mutable = ["batch_stats"] if train else False
            if train:
                kwargs["rngs"] = {"dropout": rng}
            if is_hybrid:
                out = model.apply(variables, nodes, adj,
                                  node_mask, fp,
                                  mutable=mutable, **kwargs)
                (pred, latent), new_vars = out if train else (out, {})
            else:
                out = model.apply(variables, nodes, adj,
                                  node_mask, mutable=mutable,
                                  **kwargs)
                pred, new_vars = out if train else (out, {})
                latent = None
            new_bs = new_vars.get("batch_stats", batch_stats) if train \
                else batch_stats
            if cdt is not None:
                pred = pred.astype(jnp.float32)
                latent = None if latent is None \
                    else latent.astype(jnp.float32)
                new_bs = _cast_tree(new_bs, jnp.float32)
            return pred, latent, unfreeze(new_bs)

        # cfg.remat: recompute the forward during the backward instead of
        # saving activations (jax.checkpoint) — memory for FLOPs; math
        # equivalent up to recompute fusion reordering (~1e-7 relative,
        # pinned by test_trainer).  prevent_cse stays default True so
        # the recompute isn't folded back in.
        def fwd_train(p, bs, b, r):
            return forward(p, bs, b, r, train=True)

        if self.cfg.remat:
            fwd_train = jax.checkpoint(fwd_train)

        def loss_fn(params, batch_stats, batch, rng):
            pred, latent, new_bs = fwd_train(params, batch_stats, batch,
                                             rng)
            mse = _masked_mse(pred, batch["y"], batch["sample_mask"])
            loss = mse
            kl = jnp.float32(0.0)
            if is_hybrid and kl_lambda > 0:
                kl = kl_loss(latent, batch["sample_mask"])
                loss = loss + kl_lambda * kl
            return loss, (mse, kl, new_bs)

        def train_step_carried(state: TrainState, params_c, batch, rng):
            """One step given the compute-dtype working copy of the
            params.  Under bf16 the copy is produced by the PREVIOUS
            step's optimizer epilogue (the cast fuses into the Adam
            param write), so the forward/backward never re-reads the
            f32 master weights — that read was ~144MB/step, the last
            avoidable stream in the roofline.  Gradients come out bf16
            (w.r.t. the bf16 copy); Adam's arithmetic stays f32 via
            dtype promotion (measured indistinguishable from f32
            grads).

            (measured dead end kept for the record: explicitly casting
            f32 grads to bf16 changed nothing — XLA already fuses the
            backward epilogue into the optimizer.)
            """
            (loss, (mse, kl, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_c, state.batch_stats,
                                       batch, rng)
            if master_bf16:
                # bf16 master + stochastic rounding, single fused pass
                # (train/optim.py::torch_adam_sr_update): Adam math and
                # the round-to-bf16 in one loop, hash-based noise — no
                # f32 param/update stream ever hits HBM
                new_params, new_opt = torch_adam_sr_update(
                    grads, state.opt_state, state.params,
                    jax.random.fold_in(rng, 0x5e), lr=self._lr,
                    weight_decay=cfg.weight_decay,
                    moment_dtype=cfg.adam_moment_dtype)
            else:
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1,
                                      params=new_params,
                                      batch_stats=new_bs,
                                      opt_state=new_opt)
            new_params_c = (_cast_tree(new_params, cdt)
                            if cdt is not None else new_params)
            return new_state, new_params_c, \
                {"loss": loss, "mse": mse, "kl": kl}

        def train_step(state: TrainState, batch, rng):
            params_c = (_cast_tree(state.params, cdt)
                        if cdt is not None else state.params)
            new_state, _, metrics = train_step_carried(
                state, params_c, batch, rng)
            return new_state, metrics

        def eval_step(state: TrainState, batch):
            pred, _, _ = forward(state.params, state.batch_stats, batch,
                                 jax.random.PRNGKey(0), train=False)
            pred = pred.reshape(-1)
            mse = _masked_mse(pred, batch["y"], batch["sample_mask"])
            denorm = pred * scale + mean
            orig_mse = _masked_mse(denorm, batch["y_orig"],
                                   batch["sample_mask"])
            return pred, denorm, mse, orig_mse

        def train_epoch_scan(state: TrainState, perm: jnp.ndarray,
                             sample_masks: jnp.ndarray, rng, data):
            """One WHOLE epoch as a single XLA program.

            The tunneled-TPU-native design: the dataset lives on device;
            ``perm [n_batches, B]`` indexes it, batches are gathered on
            device inside a ``lax.scan`` over steps.  Host<->device
            traffic per epoch is one index array + one scalar out,
            instead of per-step batch uploads + metric syncs.
            """
            def gather(inp):
                idx, smask = inp
                batch = gather_batch(data, idx, fp_dim)
                batch["sample_mask"] = smask
                return constrain(batch)

            if cdt is None or master_bf16:
                # master_bf16: the params ARE the compute-dtype copy, so
                # carrying a second tree would just duplicate 72MB in
                # the scan carry (measured: 310 us/step of copies in the
                # first SR build's trace, profiles/bf16_master_sr)
                def body(carry, inp):
                    st, r = carry
                    r, sub = jax.random.split(r)
                    st, metrics = train_step(st, gather(inp), sub)
                    return (st, r), metrics["loss"]

                (state, _), losses = jax.lax.scan(
                    body, (state, rng), (perm, sample_masks))
            else:
                # mixed precision: thread the bf16 working copy through
                # the carry so each step's copy is the previous step's
                # fused optimizer output (one f32->bf16 cast per EPOCH
                # instead of a 144MB f32 weight re-read per STEP)
                def body(carry, inp):
                    st, pc, r = carry
                    r, sub = jax.random.split(r)
                    st, pc, metrics = train_step_carried(
                        st, pc, gather(inp), sub)
                    return (st, pc, r), metrics["loss"]

                params_c = _cast_tree(state.params, cdt)
                (state, _, _), losses = jax.lax.scan(
                    body, (state, params_c, rng), (perm, sample_masks))
            return state, losses.mean()

        def eval_scan(state: TrainState, perm: jnp.ndarray,
                      sample_masks: jnp.ndarray, data):
            def body(_, inp):
                idx, smask = inp
                batch = gather_batch(data, idx, fp_dim)
                batch["sample_mask"] = smask
                batch = constrain(batch)
                pred, dn, mse, omse = eval_step(state, batch)
                return None, (pred, dn, mse, omse)

            _, (preds, denorms, mses, omses) = jax.lax.scan(
                body, None, (perm, sample_masks))
            return preds, denorms, mses.mean(), omses.mean()

        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._eval_step = jax.jit(eval_step)
        self._train_epoch_scan = jax.jit(train_epoch_scan,
                                         donate_argnums=0)
        self._eval_scan = jax.jit(eval_scan)

    # ------------------------------------------------------------------
    def _to_device(self, batch: GraphBatch) -> Dict[str, jnp.ndarray]:
        d = batch.as_dict()
        if self.mesh is not None:
            d = shard_batch(d, self.mesh)
        return d

    def _device_dataset(self, ds: MolecularDataset) -> Dict[str, jnp.ndarray]:
        """Upload a dataset's padded arrays to device once (cached).

        Under a mesh the dataset is replicated (a few tens of MB at
        reference scale); per-batch gathers inside the epoch scan are then
        resharded onto the ``data`` axis by the sharding constraint."""
        cache = getattr(self, "_dev_cache", {})
        key = id(ds)
        if key not in cache:
            if self.cfg.dataset_storage not in ("float32", "compact"):
                raise ValueError(
                    f"dataset_storage={self.cfg.dataset_storage!r}; "
                    "expected 'float32' or 'compact'")
            if self.cfg.dataset_storage == "compact":
                # ~5.3x smaller HBM footprint, bit-exact unpack per batch
                # inside the scan (data/packed.py) — the one-chip capacity
                # dial for 10^6+-molecule datasets
                host = pack_dataset(ds)
            else:
                host = {
                    "nodes": ds.nodes, "edges": ds.edges,
                    "node_mask": ds.node_mask, "edge_mask": ds.edge_mask,
                    "fp": ds.fp, "y": ds.y, "y_orig": ds.y_orig,
                }
            if self.mesh is not None:
                dev = replicate(host, self.mesh)
            else:
                dev = {k: jnp.asarray(v) for k, v in host.items()}
            # block_until_ready: the axon relay can deadlock a later
            # readback when a program consumes unmaterialized transfers
            cache[key] = jax.block_until_ready(dev)
            self._dev_cache = cache
        return cache[key]

    @staticmethod
    def _epoch_indices(n: int, batch_size: int,
                       rng: Optional[np.random.Generator] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """(perm [n_batches, B], sample_mask [n_batches, B]); the final
        partial batch is padded with index 0 rows masked out."""
        idx = np.arange(n) if rng is None else rng.permutation(n)
        n_batches = (n + batch_size - 1) // batch_size
        pad = n_batches * batch_size - n
        mask = np.ones(n_batches * batch_size, np.float32)
        if pad:
            idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
            mask[-pad:] = 0.0
        return (idx.reshape(n_batches, batch_size).astype(np.int32),
                mask.reshape(n_batches, batch_size))

    def train_epoch(self, state: TrainState, epoch: int,
                    rng: jax.Array) -> Tuple[TrainState, Dict]:
        if self._train_step is None:
            self._build_steps()
        cfg = self.cfg
        t0 = time.perf_counter()
        # whole epoch in one scan over the on-device dataset — the same
        # fused program is the single-chip AND the data-parallel path
        # (sharding constraints inside the scan partition each batch over
        # the mesh's `data` axis; see _build_steps)
        if self.mesh is not None and \
                cfg.batch_size % self.mesh.shape.get("data", 1):
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by data-axis "
                f"size {self.mesh.shape.get('data', 1)}")
        data = self._device_dataset(self.train_ds)
        host_rng = np.random.default_rng(cfg.seed + epoch)
        perm, smask = self._epoch_indices(len(self.train_ds),
                                          cfg.batch_size, host_rng)
        inputs = jax.block_until_ready(
            (jnp.asarray(perm), jnp.asarray(smask), rng))
        state, mean_loss = self._train_epoch_scan(
            state, inputs[0], inputs[1], inputs[2], data)
        n_mol = len(self.train_ds)
        total_loss = float(mean_loss)
        dt = time.perf_counter() - t0
        return state, {
            "train_loss": total_loss,
            "epoch_time_s": dt,
            "molecules_per_s": n_mol / dt if dt > 0 else 0.0,
        }

    def evaluate(self, state: TrainState,
                 ds: Optional[MolecularDataset] = None) -> Dict:
        """Per-epoch validation replicating reference metric semantics:
        mean of per-batch MSEs (``train.py:278`` quirk) for both normalized
        and original-scale targets; also returns predictions."""
        if self._eval_step is None:
            self._build_steps()
        ds = ds or self.val_ds
        cfg = self.cfg
        if self.mesh is not None and \
                cfg.eval_batch_size % self.mesh.shape.get("data", 1):
            raise ValueError(
                f"eval_batch_size {cfg.eval_batch_size} not divisible by "
                f"data-axis size {self.mesh.shape.get('data', 1)}")
        data = self._device_dataset(ds)
        perm, smask = self._epoch_indices(len(ds), cfg.eval_batch_size)
        inputs = jax.block_until_ready(
            (jnp.asarray(perm), jnp.asarray(smask)))
        preds, denorms, mse, omse = self._eval_scan(
            state, inputs[0], inputs[1], data)
        keep = smask.reshape(-1) > 0
        return {
            "val_mse": float(mse),
            "original_mse": float(omse),
            "pred": np.asarray(preds).reshape(-1)[keep],
            "pred_denorm": np.asarray(denorms).reshape(-1)[keep],
        }

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None,
            state: Optional[TrainState] = None,
            start_epoch: int = 0,
            verbose: bool = True,
            save_best: bool = True,
            save_min_interval_s: float = 60.0
            ) -> Tuple[TrainState, TrainState, List]:
        """Full training run; returns (final_state, best_state, history).

        Best-checkpoint handling is TPU-tunnel-aware: the best state is
        kept as device arrays (holding the reference simply disables
        buffer donation for that step) and serialized to disk at most
        every ``save_min_interval_s`` — plus once at the end — instead of
        the reference's save-on-every-improvement, which at this model
        size writes ~400 MB per improved epoch (``train.py:287-296``).
        """
        cfg = self.cfg
        epochs = cfg.epochs if epochs is None else epochs
        if state is None:
            state = self.init_state()
        # multi-process (jax.distributed) runs: every process executes the
        # same SPMD program, but only process 0 touches the shared
        # filesystem — concurrent writers would interleave the checkpoint
        # bytes and the JSONL log
        is_primary = jax.process_index() == 0
        save_best = save_best and is_primary
        verbose = verbose and is_primary
        log_path = self.log_path if is_primary else None
        # per-epoch keys are fold_in(base, epoch) rather than sequential
        # splits: a resumed run (start_epoch=k) then consumes the SAME
        # permutation/dropout streams for epochs k.. as an uninterrupted
        # run, making checkpoint-resume bit-deterministic
        # (test_mesh_parity.py::test_mesh_checkpoint_round_trip)
        rng = jax.random.PRNGKey(cfg.seed + 1234)
        best_state = state
        best_metric = float("inf")
        best_norm_mse = float("inf")
        best_row: Dict = {}
        last_save = 0.0
        ckpt_path = os.path.join(self.ckpt_dir, "best_model.msgpack") \
            if self.ckpt_dir else None
        for epoch in range(start_epoch, epochs):
            sub = jax.random.fold_in(rng, epoch)
            state, tr = self.train_epoch(state, epoch, sub)
            row = {"epoch": epoch + 1, **tr}
            if self.val_ds is not None:
                ev = self.evaluate(state)
                row["val_mse"] = ev["val_mse"]
                row["original_mse"] = ev["original_mse"]
                metric = ev[cfg.select_metric] if cfg.select_metric in ev \
                    else ev["val_mse"]
                if metric < best_metric:
                    best_metric = metric
                    best_norm_mse = ev["val_mse"]
                    # on-device copy: the train step donates its input
                    # state, which DELETES the old buffers regardless of
                    # live references — a bare `best_state = state` would
                    # be invalidated by the next epoch
                    best_state = jax.tree_util.tree_map(jnp.copy, state)
                    best_row = row
                    row["new_best"] = True
                    now = time.perf_counter()
                    if save_best and ckpt_path and \
                            now - last_save > save_min_interval_s:
                        # intermediate saves are params-only (light):
                        # device_get of the optimizer state triples the
                        # bytes pulled over the TPU tunnel
                        self.save(ckpt_path, best_state, row, light=True)
                        last_save = now
            self.history.append(row)
            if log_path:
                with open(log_path, "a") as f:
                    f.write(json.dumps(
                        {k: v for k, v in row.items()
                         if isinstance(v, (int, float, bool, str))}) + "\n")
            if verbose:
                msg = (f"Epoch {epoch + 1:4d} | Train Loss: "
                       f"{row['train_loss']:.4f}")
                if "val_mse" in row:
                    msg += (f" | Val MSE: {row['val_mse']:.4f} | "
                            f"Original MSE: {row['original_mse']:.4f}")
                if row.get("new_best"):
                    msg += "  *** new best ***"
                print(msg)
        if self.val_ds is None:
            # without validation there is no best-by-val-MSE selection;
            # the initial `best_state = state` alias would hold buffers
            # DELETED by the first donating train step, so return the
            # final state instead
            best_state = state
        if save_best and ckpt_path and best_row:
            self.save(ckpt_path, best_state, best_row)
        self.best_metric = best_metric
        self.best_norm_mse = best_norm_mse
        return state, best_state, self.history

    # ------------------------------------------------------------------
    def save(self, path: str, state: TrainState,
             extra_meta: Optional[Dict] = None,
             light: bool = False) -> None:
        meta = {
            "config": dataclasses.asdict(self.cfg),
            "scaler": self.scaler.to_dict(),
            "max_nodes": self.train_ds.max_nodes,
            "max_edges": self.train_ds.max_edges,
        }
        if extra_meta:
            meta.update({k: v for k, v in extra_meta.items()
                         if isinstance(v, (int, float, bool, str))})
        save_checkpoint(path, state, meta, light=light)

    def load(self, path: str) -> Tuple[TrainState, Dict]:
        from .checkpoint import checkpoint_is_light

        fresh = jax.device_get(self.init_state())
        if checkpoint_is_light(path):
            target = {"step": fresh.step, "params": fresh.params,
                      "batch_stats": fresh.batch_stats}
            restored, meta = load_checkpoint(path, target)
            state = fresh.replace(step=restored["step"],
                                  params=restored["params"],
                                  batch_stats=restored["batch_stats"])
        else:
            state, meta = load_checkpoint(path, fresh)
        if self.mesh is not None:
            # restored leaves are host numpy; re-place them with the
            # mesh shardings (TP kernels included) before resuming
            state = shard_state(state, self.mesh)
        return state, meta
