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
# In a source checkout they live in <repo>/datasets; in an installed
# package (no repo tree above the package) they are regenerated
# deterministically into a user cache — generate_splits(seed=42) is the
# exact generator that froze them (pinned by
# test_data.py::test_bundled_splits_frozen), so the fallback files are
# identical to the committed ones.
DATASET_DIR = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))), "datasets")
# Probe for an actual split file, not the bare directory: in
# site-packages a foreign "datasets" package (e.g. HuggingFace's) would
# otherwise satisfy an isdir() check and shadow the cache fallback.
if not _os.path.isfile(_os.path.join(DATASET_DIR, "train_data.csv")):
    DATASET_DIR = _os.path.join(
        _os.path.expanduser("~"), ".cache", "mgat_graphsage_tpu",
        "datasets")
TRAIN_CSV = _os.path.join(DATASET_DIR, "train_data.csv")
VAL_CSV = _os.path.join(DATASET_DIR, "validation_data.csv")
TEST_CSV = _os.path.join(DATASET_DIR, "test_data.csv")
FULL_CSV = _os.path.join(DATASET_DIR, "full_data.csv")


def ensure_bundled_datasets() -> str:
    """Materialize the frozen seed-42 splits if absent (installed-package
    mode).  ~3 s one-time; a no-op in a source checkout where the
    committed ``datasets/`` directory exists."""
    if all(_os.path.exists(p) for p in
           (TRAIN_CSV, VAL_CSV, TEST_CSV, FULL_CSV)):
        return DATASET_DIR
    _os.makedirs(DATASET_DIR, exist_ok=True)
    (tr_s, tr_y), (va_s, va_y), (te_s, te_y) = generate_splits(
        n_train=3000, n_val=500, n_test=961, seed=42)
    write_csv(TRAIN_CSV, tr_s, tr_y)
    write_csv(VAL_CSV, va_s, va_y)
    write_csv(TEST_CSV, te_s, te_y)
    write_csv(FULL_CSV, tr_s + va_s + te_s,
              list(tr_y) + list(va_y) + list(te_y))
    return DATASET_DIR


__all__ = [
    "GraphBatch", "MolecularDataset", "StandardScaler", "load_csv",
    "pad_to_multiple", "write_csv", "generate_dataset", "generate_splits",
    "DATASET_DIR", "TRAIN_CSV", "VAL_CSV", "TEST_CSV", "FULL_CSV",
    "ensure_bundled_datasets",
]
