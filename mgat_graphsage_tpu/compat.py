"""Checkpoint interchange with the reference's pickled ``best_model.pth``.

The reference saves a composite torch dict — three ``state_dict``s, the
optimizer state, both MSEs, and a pickled sklearn ``StandardScaler``
(``/root/reference/train.py:287-296``) — and every reference consumer
(``test.py:160-164``, ``gnnexplainer.py:1352-1366``) reloads it with
torch. A user migrating to this framework has such checkpoints from
already-finished training runs; this module converts them losslessly to
our msgpack + JSON-sidecar format so ``eval.predict``, the explain
pipeline, and serving work on them unchanged:

    python -m mgat_graphsage_tpu.compat import best_model.pth \
        checkpoints/imported/best_model.msgpack --preset flagship

The reverse direction exports a natively-trained hybrid checkpoint as a
reference-format composite ``.pth`` that ``test.py``/``gnnexplainer.py``
consume unmodified (widths are inferred from the param shapes, so every
fingerprint-suite variant exports):

    python -m mgat_graphsage_tpu.compat export \
        checkpoints/flagship/best_model.msgpack best_model.pth

Weight layout translation (the inverse of
``compare/torch_ref.py::load_jax_params_into_torch``):

* ``nn.Linear``  weight ``[out, in]``  -> flax kernel ``[in, out]`` (transpose)
* ModifiedGAT center-tap convs are stored torch-layout in our tree
  (``conv3/conv5 -> {weight [out,in,k], bias}``) — direct copy
* ``nn.Conv1d`` (CNN branch) ``[out, in, k]`` -> flax ``[k, in, out]``
* PyG ``SAGEConv`` ``lin_l`` (aggregated neighbors, bias) / ``lin_r``
  (root, no bias); the pre-2.0 PyG names ``lin_rel``/``lin_root`` are
  accepted as aliases.

Torch is only required when this module is used (same gating as
``compare/torch_ref.py``). The optimizer state is NOT imported: torch
Adam moments do not transfer to optax pytrees, and the reference itself
never resumes — the result is a light (inference + further-training
init) checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Dict, Tuple

import numpy as np

from .models.layers import cnn_fc1_torch_to_pos_major

__all__ = ["import_reference_checkpoint", "export_reference_checkpoint",
           "reference_state_dicts_to_params",
           "import_baseline_checkpoint", "baseline_state_dict_to_params"]

# the reference's dynamic-shape torch graphs have no padding budget; these
# defaults cover its published molecule range (11-94 atoms, README.md:127)
DEFAULT_MAX_NODES = 96
DEFAULT_MAX_EDGES = 224


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _lin(sd: Dict, name: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _sage_key(sd: Dict, prefix: str, modern: str, legacy: str) -> str:
    """Resolve PyG SAGEConv param naming across PyG versions."""
    if f"{prefix}.{modern}.weight" in sd:
        return f"{prefix}.{modern}"
    if f"{prefix}.{legacy}.weight" in sd:
        return f"{prefix}.{legacy}"
    raise KeyError(
        f"checkpoint has neither {prefix}.{modern}.weight nor "
        f"{prefix}.{legacy}.weight — not a GAT_GraphSAGE state dict? "
        f"keys: {sorted(sd)[:8]}...")


def reference_state_dicts_to_params(gat_sd: Dict, cnn_sd: Dict,
                                    comb_sd: Dict) -> Dict:
    """Three reference ``state_dict``s -> flax ``HybridModel`` params."""
    conv1 = {}
    for name in ("query_transform", "key_transform", "value_transform",
                 "linear_transform"):
        conv1[name] = _lin(gat_sd, f"conv1.{name}")
    for cname in ("conv3", "conv5"):
        conv1[cname] = {"weight": _np(gat_sd[f"conv1.{cname}.weight"]),
                        "bias": _np(gat_sd[f"conv1.{cname}.bias"])}
    lin_l = _sage_key(gat_sd, "conv2", "lin_l", "lin_rel")
    lin_r = _sage_key(gat_sd, "conv2", "lin_r", "lin_root")
    gat = {
        "conv1": conv1,
        "conv2": {
            "lin_l": {"kernel": _np(gat_sd[f"{lin_l}.weight"]).T,
                      "bias": _np(gat_sd[f"{lin_l}.bias"])},
            "lin_r": {"kernel": _np(gat_sd[f"{lin_r}.weight"]).T},
        },
        "fc_g1": _lin(gat_sd, "fc_g1"),
        "fc_g2": _lin(gat_sd, "fc_g2"),
        "out": _lin(gat_sd, "out"),
    }
    cnn = {}
    for i in (1, 2, 3):
        w = _np(cnn_sd[f"conv{i}.weight"])  # [out, in, k]
        cnn[f"conv{i}"] = {"kernel": np.transpose(w, (2, 1, 0)),
                           "bias": _np(cnn_sd[f"conv{i}.bias"])}
    cnn["fc1"] = _lin(cnn_sd, "fc1")
    # torch's fc1 rows are channel-major (flatten order c*W + w);
    # CNNNet stores them pos-major (w*128 + c) — see models/layers.py.
    cnn["fc1"]["kernel"] = cnn_fc1_torch_to_pos_major(cnn["fc1"]["kernel"])
    cnn["fc2"] = _lin(cnn_sd, "fc2")
    combined = {"fc1": _lin(comb_sd, "fc1"), "fc2": _lin(comb_sd, "fc2")}
    return {"gat_graphsage": gat, "cnn": cnn, "combined": combined}


def _first_key(sd: Dict, prefix: str, *cands: str) -> str:
    """Resolve a PyG param name across PyG versions (first present)."""
    for c in cands:
        if f"{prefix}.{c}" in sd:
            return f"{prefix}.{c}"
    raise KeyError(f"none of {[f'{prefix}.{c}' for c in cands]} in "
                   f"checkpoint — keys: {sorted(sd)[:8]}...")


def _pyg_gat(sd: Dict, prefix: str) -> Dict:
    """PyG ``GATConv`` state-dict slice -> flax GATConv params.

    Accepts the linear under ``lin`` (PyG >=2.3) / ``lin_src`` (2.0-2.2)
    / ``lin_l`` (pre-2.0) and the attention vectors under
    ``att_src``/``att_dst`` (modern) or ``att_l``/``att_r`` (legacy);
    layouts are identical, only the names moved.
    """
    lin = _first_key(sd, prefix, "lin.weight", "lin_src.weight",
                     "lin_l.weight")[: -len(".weight")]
    att_s = _first_key(sd, prefix, "att_src", "att_l")
    att_d = _first_key(sd, prefix, "att_dst", "att_r")
    return {"lin": {"kernel": _np(sd[f"{lin}.weight"]).T},
            "att_src": _np(sd[att_s]),
            "att_dst": _np(sd[att_d]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _pyg_gcn(sd: Dict, prefix: str) -> Dict:
    """PyG ``GCNConv`` slice -> flax params.  Modern PyG stores the
    linear under ``lin.weight`` ([out, in]); pre-2.0 stored a bare
    ``weight`` in [in, out] layout (applied as x @ weight)."""
    if f"{prefix}.lin.weight" in sd:
        kernel = _np(sd[f"{prefix}.lin.weight"]).T
    else:
        kernel = _np(sd[f"{prefix}.weight"])
    return {"lin": {"kernel": kernel}, "bias": _np(sd[f"{prefix}.bias"])}


def _pyg_sage(sd: Dict, prefix: str) -> Dict:
    lin_l = _sage_key(sd, prefix, "lin_l", "lin_rel")
    lin_r = _sage_key(sd, prefix, "lin_r", "lin_root")
    return {"lin_l": {"kernel": _np(sd[f"{lin_l}.weight"]).T,
                      "bias": _np(sd[f"{lin_l}.bias"])},
            "lin_r": {"kernel": _np(sd[f"{lin_r}.weight"]).T}}


def baseline_state_dict_to_params(model_key: str, sd: Dict,
                                  attention: str = "modified"
                                  ) -> Tuple[Dict, Dict]:
    """A reference bare ``state_dict`` -> (flax params, batch_stats).

    Covers the six baseline GNNs (``gnn/gat.py:135`` saves
    ``model.state_dict()``; ``gnn/predict-*.py`` reload it) and the
    graph-only ablation models 1-3 (``ablation/model1.py:146``).
    ``model_key`` is ``TrainConfig.model``; for ``gat_graphsage`` the
    ``attention`` flavor picks plain PyG GATConv (model 1) vs the
    ModifiedGATLayer (models 2/3).
    """
    bs: Dict = {}
    if model_key == "sage":           # gnn/graphsage.py:50-75
        params = {"sage1": _pyg_sage(sd, "sage1"),
                  "sage2": _pyg_sage(sd, "sage2"),
                  "fc_g1": _lin(sd, "fc_g1"), "fc_g2": _lin(sd, "fc_g2"),
                  "out": _lin(sd, "out")}
    elif model_key == "gat":          # gnn/gat.py:51-71
        params = {"gcn1": _pyg_gat(sd, "gcn1"),
                  "gcn2": _pyg_gat(sd, "gcn2"),
                  "fc_g1": _lin(sd, "fc_g1"), "out": _lin(sd, "out")}
    elif model_key == "gcn":          # gnn/gcn.py:42-66
        params = {"conv1": _pyg_gcn(sd, "conv1"),
                  "conv2": _pyg_gcn(sd, "conv2"),
                  "conv3": _pyg_gcn(sd, "conv3"),
                  "fc_g1": _lin(sd, "fc_g1"), "fc_g2": _lin(sd, "fc_g2")}
    elif model_key == "gat_gcn":      # gnn/gat-gcn.py:53-76
        params = {"conv1": _pyg_gat(sd, "conv1"),
                  "conv2": _pyg_gcn(sd, "conv2"),
                  "fc_g1": _lin(sd, "fc_g1"), "fc_g2": _lin(sd, "fc_g2"),
                  "out": _lin(sd, "out")}
    elif model_key == "gin":          # gnn/gin.py:56-106
        params = {}
        for i in range(1, 6):
            # reference attribute names (conv1.nn.0 / bn1); the in-repo
            # torch oracle's ModuleList layout (convs.0.mlp.0 / bns.0)
            # is accepted as an alias
            conv = (f"conv{i}.nn" if f"conv{i}.nn.0.weight" in sd
                    else f"convs.{i - 1}.mlp")
            bn = f"bn{i}" if f"bn{i}.weight" in sd else f"bns.{i - 1}"
            params[f"conv{i}"] = {"mlp_0": _lin(sd, f"{conv}.0"),
                                  "mlp_1": _lin(sd, f"{conv}.2")}
            params[f"bn{i}"] = {"scale": _np(sd[f"{bn}.weight"]),
                                "bias": _np(sd[f"{bn}.bias"])}
            bs[f"bn{i}"] = {"mean": _np(sd[f"{bn}.running_mean"]),
                            "var": _np(sd[f"{bn}.running_var"])}
        for name in ("fc1_xd", "fc1", "fc2", "out"):
            params[name] = _lin(sd, name)
    elif model_key == "cheb":         # gnn/chebnet.py:50-96
        params = {"conv1": {"lin": _lin(sd, "conv1.lin")},
                  "conv2": {"lin": _lin(sd, "conv2.lin")},
                  "fc_g1": _lin(sd, "fc_g1"), "out": _lin(sd, "out")}
    elif model_key == "gat_graphsage":
        if attention == "gat10":      # ablation/model1.py:53-77
            conv1 = _pyg_gat(sd, "conv1")
        else:                         # ablation/model 2.py / model 3.py
            conv1 = {}
            for name in ("query_transform", "key_transform",
                         "value_transform", "linear_transform"):
                conv1[name] = _lin(sd, f"conv1.{name}")
            for cname in ("conv3", "conv5"):
                conv1[cname] = {
                    "weight": _np(sd[f"conv1.{cname}.weight"]),
                    "bias": _np(sd[f"conv1.{cname}.bias"])}
        params = {"conv1": conv1, "conv2": _pyg_sage(sd, "conv2"),
                  "fc_g1": _lin(sd, "fc_g1"), "fc_g2": _lin(sd, "fc_g2"),
                  "out": _lin(sd, "out")}
    else:
        raise ValueError(f"no baseline state-dict translation for "
                         f"model '{model_key}'")
    return params, bs


def import_baseline_checkpoint(
    pth_path: str,
    out_path: str,
    preset: str,
    max_nodes: int = DEFAULT_MAX_NODES,
    max_edges: int = DEFAULT_MAX_EDGES,
) -> Tuple[str, Dict]:
    """Convert a reference bare ``state_dict`` checkpoint (baseline GNNs
    ``gnn/*.py``, ablation models 1-3) to a native light checkpoint.

    The reference consumers rebuild the matching class and
    ``load_state_dict`` (``gnn/predict-gcn.py:79-120``); here the preset
    names the architecture. Baselines train on raw targets
    (``scale_targets=False``), so the sidecar carries the identity
    scaler. VERDICT r3 next #8.
    """
    import torch

    try:
        sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    except TypeError:
        sd = torch.load(pth_path, map_location="cpu")
    if not hasattr(sd, "items") or any(
            not hasattr(v, "detach") for v in sd.values()):
        raise ValueError(
            f"{pth_path} is not a bare state_dict (tensor-valued dict); "
            f"composite hybrid checkpoints import via "
            f"import_reference_checkpoint")

    import jax
    import jax.numpy as jnp

    from .ops import dense_adjacency
    from .train.checkpoint import save_checkpoint
    from .train.config import get_config
    from .train.trainer import build_model

    cfg = get_config(preset)
    if cfg.is_hybrid:
        raise ValueError(
            f"preset '{preset}' is the hybrid — its composite checkpoint "
            f"imports via import_reference_checkpoint / the 'import' "
            f"subcommand")
    params, batch_stats = baseline_state_dict_to_params(
        cfg.model, sd, attention=cfg.attention)

    feat = 5 if cfg.featurizer == "5" else 35
    model = build_model(cfg)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(
        rngs,
        jnp.zeros((1, max_nodes, feat)),
        dense_adjacency(jnp.zeros((1, 2, max_edges), jnp.int32),
                        jnp.zeros((1, max_edges)), max_nodes),
        jnp.ones((1, max_nodes)))
    # axon readback-deadlock guard (see import_reference_checkpoint)
    variables = jax.block_until_ready(variables)
    from flax.core import unfreeze
    template = jax.device_get(unfreeze(variables["params"]))
    _check_against_template(template, params)
    if batch_stats:
        bs_template = jax.device_get(
            unfreeze(variables.get("batch_stats", {})))
        _check_against_template(bs_template, batch_stats)

    meta = {
        "config": dataclasses.asdict(cfg),
        # baselines train on raw targets (gnn/*.py have no scaler)
        "scaler": {"mean": 0.0, "scale": 1.0},
        "max_nodes": int(max_nodes),
        "max_edges": int(max_edges),
        "imported_from": pth_path,
    }
    state = {"step": np.zeros((), np.int32), "params": params,
             "batch_stats": batch_stats}
    save_checkpoint(out_path, state, meta, light=True)
    return out_path, meta


def _check_against_template(template, converted, path=""):
    """Shape/structure check against the preset's initialized model; a
    mismatch means the wrong --preset for this checkpoint (e.g. a
    morgan2048 run imported as flagship)."""
    t_keys, c_keys = set(template), set(converted)
    if t_keys != c_keys:
        raise ValueError(
            f"param tree mismatch at '{path or '<root>'}': preset expects "
            f"{sorted(t_keys)}, checkpoint provides {sorted(c_keys)}")
    for k in template:
        t, c = template[k], converted[k]
        if isinstance(t, dict):
            _check_against_template(t, c, f"{path}/{k}")
        elif tuple(np.shape(t)) != tuple(np.shape(c)):
            raise ValueError(
                f"shape mismatch at '{path}/{k}': preset expects "
                f"{tuple(np.shape(t))}, checkpoint has "
                f"{tuple(np.shape(c))} — wrong --preset for this "
                f"checkpoint?")


def fingerprint_layout_warning(preset: str, fingerprint: str) -> str:
    """Per-fingerprint interchange caveat text (VERDICT r4 next #4).

    Three classes of fingerprint, three messages:

    - **Morgan family** (``ecfp*``/``fcfp*``/``morgan*``): an escape
      hatch exists — ``fingerprint_layout='rdkit'`` feeds the imported
      model RDKit-layout bits.
    - **maccs / bci**: no escape hatch — this repo uses its own key
      assignment (the true MACCS key SMARTS are proprietary; PARITY.md).
    - **smifp**: no escape hatch *can* exist — the reference hashes
      substrings with Python's salted ``hash()``
      (``fingerprint/SMIFP.py:60-88``), so even the reference cannot
      reproduce its own checkpoints across processes; there is no
      stable layout to reproduce (docs/MIGRATION.md).
    """
    from .chem.fingerprints import FINGERPRINT_DIMS

    common = (
        f"importing a fingerprint-consuming preset "
        f"('{preset}', fingerprint={fingerprint}): if this "
        f".pth was trained with RDKit (as the reference's was, "
        f"train.py:58-63), its CNN branch learned RDKit's bit "
        f"POSITIONS, and this repo's default layout assigns the "
        f"same substructures to different positions — the imported "
        f"model would silently see permuted fingerprint inputs "
        f"and degrade. ")
    if f"{fingerprint}_rdkit" in FINGERPRINT_DIMS:
        detail = (
            "Escape hatch: pass fingerprint_layout='rdkit' (CLI: "
            "--fingerprint-layout rdkit) to feed it RDKit-layout "
            "Morgan bits (best-effort reimplementation; see "
            "chem/fingerprints.py and docs/MIGRATION.md).")
    elif fingerprint == "smifp":
        detail = (
            "No escape hatch exists for smifp — and none can: the "
            "reference hashes SMILES substrings with Python's "
            "SALTED hash() (fingerprint/SMIFP.py:60-88), so its "
            "own checkpoints are not reproducible across processes "
            "either; there is no stable layout to reproduce. See "
            "docs/MIGRATION.md.")
    else:  # maccs / bci: own key assignment, documented
        detail = (
            f"No RDKit-layout escape hatch exists for "
            f"{fingerprint} (this repo uses its own key "
            f"assignment — the true MACCS key SMARTS are "
            f"proprietary; see PARITY.md and docs/MIGRATION.md); "
            f"validate imported-model predictions before use.")
    return (common + detail + " Checkpoints trained by THIS "
            "framework's exporter are unaffected.")


def import_reference_checkpoint(
    pth_path: str,
    out_path: str,
    preset: str = "flagship",
    max_nodes: int = DEFAULT_MAX_NODES,
    max_edges: int = DEFAULT_MAX_EDGES,
    fingerprint_layout: str = "crc32",
) -> Tuple[str, Dict]:
    """Convert a reference ``best_model.pth`` to a native light checkpoint.

    Returns ``(out_path, sidecar_meta)``. The output loads through
    ``eval.predict.load_model_from_checkpoint`` and the explain pipeline
    exactly like a natively-trained checkpoint.

    ``fingerprint_layout``: bit-position scheme the imported model's CNN
    branch will be fed. A checkpoint *actually trained with RDKit*
    (reference ``train.py:58-63``) learned weights over RDKit's Morgan
    bit positions; this repo's default layout hashes the same
    environments to DIFFERENT positions (CRC32 — documented divergence,
    ``chem/fingerprints.py``), so the default import emits a
    ``UserWarning``: predictions will be silently degraded for truly
    RDKit-trained weights (the bit densities match, the positions do
    not — a permuted input).  Pass ``"rdkit"`` to pin the imported
    config to the ``*_rdkit`` fingerprint variant (RDKit's published
    invariant+hash pipeline; best-effort, see the honesty note in
    ``chem/fingerprints.py``).  VERDICT r3 next #2.
    """
    import torch

    try:  # torch>=2.6 defaults weights_only=True, which would reject the
        ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    except TypeError:  # older torch: no weights_only kwarg
        ckpt = torch.load(pth_path, map_location="cpu")
    for key in ("gat_graphsage_model_state_dict", "cnn_model_state_dict",
                "combined_model_state_dict", "scaler"):
        if key not in ckpt:
            raise KeyError(
                f"'{key}' missing from {pth_path} — not a reference "
                f"composite checkpoint (train.py:287-296)? "
                f"keys: {sorted(ckpt)}")
    params = reference_state_dicts_to_params(
        ckpt["gat_graphsage_model_state_dict"],
        ckpt["cnn_model_state_dict"],
        ckpt["combined_model_state_dict"])

    # the pickled sklearn scaler was fit on y.reshape(-1, 1): mean_/scale_
    # are shape-(1,) arrays
    sk_scaler = ckpt["scaler"]
    scaler_mean = float(np.asarray(sk_scaler.mean_).reshape(-1)[0])
    scaler_scale = float(np.asarray(sk_scaler.scale_).reshape(-1)[0])

    # validate against the preset's model structure before writing
    import jax
    import jax.numpy as jnp

    from .chem.fingerprints import FINGERPRINT_DIMS
    from .ops import dense_adjacency
    from .train.checkpoint import save_checkpoint
    from .train.config import get_config
    from .train.trainer import build_model

    cfg = get_config(preset)
    if not cfg.is_hybrid:
        raise ValueError(
            f"preset '{preset}' is not a hybrid model; reference composite "
            f"checkpoints hold the 3-model hybrid")
    if fingerprint_layout not in ("crc32", "rdkit"):
        raise ValueError(
            f"fingerprint_layout must be 'crc32' or 'rdkit', "
            f"got {fingerprint_layout!r}")
    if fingerprint_layout == "rdkit":
        rd_name = f"{cfg.fingerprint}_rdkit"
        if rd_name not in FINGERPRINT_DIMS:
            raise ValueError(
                f"no RDKit-layout variant exists for "
                f"'{cfg.fingerprint}' (available for the Morgan family "
                f"only); import with the default layout instead")
        cfg = cfg.replace(fingerprint=rd_name)
    elif cfg.fingerprint is not None:
        import warnings

        warnings.warn(
            fingerprint_layout_warning(preset, cfg.fingerprint),
            UserWarning, stacklevel=2)
    model = build_model(cfg)
    fp_dim = FINGERPRINT_DIMS[cfg.fingerprint]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, max_nodes, 35)),
        dense_adjacency(jnp.zeros((1, 2, max_edges), jnp.int32),
                        jnp.zeros((1, max_edges)), max_nodes),
        jnp.ones((1, max_nodes)),
        jnp.zeros((1, fp_dim)))
    # Materialize the init output BEFORE device_get: on the tunneled
    # axon backend a readback of a never-materialized jit output
    # deadlocks forever (same gotcha Trainer.init_state guards; caught
    # live driving this CLI on the chip in round 5).
    variables = jax.block_until_ready(variables)
    from flax.core import unfreeze
    template = jax.device_get(unfreeze(variables["params"]))
    _check_against_template(template, params)

    meta = {
        "config": dataclasses.asdict(cfg),
        "scaler": {"mean": scaler_mean, "scale": scaler_scale},
        "max_nodes": int(max_nodes),
        "max_edges": int(max_edges),
        "imported_from": pth_path,
        "reference_normalized_mse": _maybe_float(ckpt.get("normalized_mse")),
        "reference_original_mse": _maybe_float(ckpt.get("original_mse")),
    }
    state = {"step": np.zeros((), np.int32), "params": params,
             "batch_stats": {}}
    save_checkpoint(out_path, state, meta, light=True)
    return out_path, meta


def export_reference_checkpoint(ckpt_path: str,
                                out_pth: str) -> Tuple[str, Dict]:
    """Export a native hybrid checkpoint as the reference's ``best_model.pth``.

    Writes the exact composite dict the reference trainer saves
    (``train.py:287-296``): three ``state_dict``s (via
    ``compare.torch_ref``'s reference twins), an empty optimizer state
    (optax moments do not transfer to torch Adam), ``normalized_mse``/
    ``original_mse`` from the sidecar, and a real pickled sklearn
    ``StandardScaler`` — so the reference's own ``test.py`` and
    ``gnnexplainer.py`` load it unmodified. Widths (fingerprint size,
    CNN fc1 hidden, 35/5 features) are inferred from the param shapes.
    """
    import json
    import os

    import torch

    from .compare.torch_ref import TorchHybrid, load_jax_params_into_torch
    from .eval.predict import load_model_from_checkpoint

    _, state, cfg, scaler, _ = load_model_from_checkpoint(ckpt_path)
    import jax

    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=np.float32),  # bf16 masters -> f32
        jax.device_get(state.params))
    if not {"gat_graphsage", "cnn", "combined"} <= set(params):
        raise ValueError(
            f"only hybrid checkpoints export to the reference composite "
            f"format; '{cfg.name}' holds {sorted(params)} "
            f"(baseline GNNs have no reference composite equivalent)")

    feat = params["gat_graphsage"]["conv1"]["query_transform"][
        "kernel"].shape[0]
    fp_in = params["cnn"]["fc1"]["kernel"].shape[0] // 128
    fc_hidden = params["cnn"]["fc1"]["kernel"].shape[1]
    fp_out = params["cnn"]["fc2"]["kernel"].shape[1]
    tmodel = TorchHybrid(features=feat, fp_dim=fp_in,
                         cnn_fc_hidden=fc_hidden, cnn_out=fp_out)
    load_jax_params_into_torch(params, tmodel)

    # a REAL sklearn scaler, because reference consumers unpickle one
    # (test.py:164 calls scaler.inverse_transform)
    from sklearn.preprocessing import StandardScaler as SkScaler
    sk = SkScaler()
    sk.mean_ = np.array([float(scaler.mean_)], dtype=np.float64)
    sk.scale_ = np.array([float(scaler.scale_)], dtype=np.float64)
    sk.var_ = sk.scale_ ** 2
    sk.n_features_in_ = 1
    sk.n_samples_seen_ = 1

    sidecar = {}
    if os.path.exists(ckpt_path + ".json"):
        with open(ckpt_path + ".json") as f:
            sidecar = json.load(f)
    composite = {
        "gat_graphsage_model_state_dict": tmodel.graph.state_dict(),
        "cnn_model_state_dict": tmodel.cnn.state_dict(),
        "combined_model_state_dict": tmodel.combined.state_dict(),
        "optimizer_state_dict": {},
        "normalized_mse": sidecar.get("val_mse"),
        "original_mse": sidecar.get("original_mse"),
        "scaler": sk,
    }
    os.makedirs(os.path.dirname(out_pth) or ".", exist_ok=True)
    torch.save(composite, out_pth)
    return out_pth, composite


def _maybe_float(v):
    try:
        return float(v) if v is not None else None
    except (TypeError, ValueError):
        return None


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Checkpoint interchange with the reference's "
                    "best_model.pth format")
    sub = p.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser(
        "import", help="reference .pth -> native msgpack + JSON sidecar")
    imp.add_argument("pth", help="reference composite checkpoint (.pth)")
    imp.add_argument("out", help="output path (.msgpack)")
    imp.add_argument("--preset", default="flagship",
                     help="hybrid preset matching the checkpoint's "
                          "fingerprint/widths (default: flagship)")
    imp.add_argument("--max-nodes", type=int, default=DEFAULT_MAX_NODES)
    imp.add_argument("--max-edges", type=int, default=DEFAULT_MAX_EDGES)
    imp.add_argument("--fingerprint-layout", default="crc32",
                     choices=("crc32", "rdkit"),
                     help="bit-position scheme to feed the imported CNN "
                          "branch: 'rdkit' for checkpoints genuinely "
                          "trained with RDKit fingerprints (the default "
                          "warns about the layout mismatch; see "
                          "docs/MIGRATION.md)")
    impb = sub.add_parser(
        "import-baseline",
        help="reference bare state_dict (baseline GNNs / ablation "
             "models 1-3) -> native msgpack")
    impb.add_argument("pth", help="bare state_dict checkpoint (.pth)")
    impb.add_argument("out", help="output path (.msgpack)")
    impb.add_argument("--preset", required=True,
                      help="matching non-hybrid preset (gcn, graphsage, "
                           "gat, gat_gcn, gin, chebnet, model1-3)")
    impb.add_argument("--max-nodes", type=int, default=DEFAULT_MAX_NODES)
    impb.add_argument("--max-edges", type=int, default=DEFAULT_MAX_EDGES)
    exp = sub.add_parser(
        "export", help="native hybrid checkpoint -> reference .pth")
    exp.add_argument("ckpt", help="native checkpoint (.msgpack)")
    exp.add_argument("out", help="output path (.pth)")
    args = p.parse_args(argv)
    if args.cmd == "import":
        out, meta = import_reference_checkpoint(
            args.pth, args.out, preset=args.preset,
            max_nodes=args.max_nodes, max_edges=args.max_edges,
            fingerprint_layout=args.fingerprint_layout)
        print(f"imported {args.pth} -> {out} (preset {args.preset}, "
              f"scaler mean={meta['scaler']['mean']:.4f} "
              f"scale={meta['scaler']['scale']:.4f})")
    elif args.cmd == "import-baseline":
        out, meta = import_baseline_checkpoint(
            args.pth, args.out, preset=args.preset,
            max_nodes=args.max_nodes, max_edges=args.max_edges)
        print(f"imported baseline {args.pth} -> {out} "
              f"(preset {args.preset}, model "
              f"{meta['config']['model']})")
    else:
        out, composite = export_reference_checkpoint(args.ckpt, args.out)
        print(f"exported {args.ckpt} -> {out} (reference composite dict: "
              f"{len(composite['gat_graphsage_model_state_dict'])} graph + "
              f"{len(composite['cnn_model_state_dict'])} cnn + "
              f"{len(composite['combined_model_state_dict'])} combined "
              f"tensors)")


if __name__ == "__main__":
    main()
