"""Checkpointing with resume (reference only saves, never resumes —
``train.py:287-296``; SURVEY.md §5 requires real resume here).

Format: one msgpack file (flax.serialization) holding the full train-state
pytree (params, optimizer state, batch stats, step) plus a JSON sidecar with
scaler mean/scale, metrics, and config — the functional equivalent of the
reference's composite ``best_model.pth`` dict {3 state_dicts, optimizer,
both MSEs, pickled scaler}.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "checkpoint_is_light"]


def save_checkpoint(path: str, state: Any,
                    metadata: Optional[Dict] = None,
                    light: bool = False) -> None:
    """Serialize a train-state pytree (+ JSON sidecar).

    ``light=True`` drops the optimizer state (2/3 of the bytes for
    Adam) — enough for inference and best-model selection; use the full
    form for resume checkpoints.  The sidecar records which form was
    written so loaders can build the right target structure.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if light and hasattr(state, "opt_state"):
        state = {"step": state.step, "params": state.params,
                 "batch_stats": state.batch_stats}
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = dict(metadata or {})
    meta["light"] = bool(light)
    with open(path + ".json", "w") as f:
        json.dump(_jsonify(meta), f, indent=2)


def checkpoint_is_light(path: str) -> bool:
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            return bool(json.load(f).get("light", False))
    return False


def load_checkpoint(path: str, target: Any) -> Tuple[Any, Dict]:
    """Restore a checkpoint into ``target``'s pytree structure."""
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt_") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir)
             if f.startswith(prefix) and f.endswith(".msgpack")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(prefix):-len(".msgpack")]))
    return os.path.join(ckpt_dir, cands[-1])


def _jsonify(obj):
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
