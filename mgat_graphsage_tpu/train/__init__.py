"""Training engine: config presets, jitted trainer, checkpoint/resume."""

from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .config import PRESETS, TrainConfig, get_config
from .trainer import TrainState, Trainer, build_model, make_optimizer

__all__ = [
    "latest_checkpoint", "load_checkpoint", "save_checkpoint",
    "PRESETS", "TrainConfig", "get_config",
    "TrainState", "Trainer", "build_model", "make_optimizer",
]
