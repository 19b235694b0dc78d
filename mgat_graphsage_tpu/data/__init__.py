"""Data layer: CSV ingestion, target scaling, fixed-shape padded batching,
and the bundled synthetic dataset generator."""

from .dataset import (
    GraphBatch,
    MolecularDataset,
    StandardScaler,
    load_csv,
    pad_to_multiple,
    write_csv,
)
from .synth import generate_dataset, generate_splits

import os as _os

# Frozen bundled splits (generated once by scripts/make_dataset.py).
DATASET_DIR = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))), "datasets")
TRAIN_CSV = _os.path.join(DATASET_DIR, "train_data.csv")
VAL_CSV = _os.path.join(DATASET_DIR, "validation_data.csv")
TEST_CSV = _os.path.join(DATASET_DIR, "test_data.csv")
FULL_CSV = _os.path.join(DATASET_DIR, "full_data.csv")

__all__ = [
    "GraphBatch", "MolecularDataset", "StandardScaler", "load_csv",
    "pad_to_multiple", "write_csv", "generate_dataset", "generate_splits",
    "DATASET_DIR", "TRAIN_CSV", "VAL_CSV", "TEST_CSV", "FULL_CSV",
]
