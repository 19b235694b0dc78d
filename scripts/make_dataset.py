"""Generate and freeze the bundled train/validation/test CSV splits.

The reference names ``train_data.csv`` / ``validation_data.csv`` /
``test_data.csv`` with a ``Smiles,pchembl`` schema (reference
``train.py:163-168``, ``test.py:150``) but ships no data; these frozen
synthetic splits stand in (seed 42, test size 961 to match the reference's
implied test-set size, ``gnnexplainer.py:1439``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mgat_graphsage_tpu.data import DATASET_DIR, generate_splits, write_csv


def main():
    (tr_s, tr_y), (va_s, va_y), (te_s, te_y) = generate_splits(
        n_train=3000, n_val=500, n_test=961, seed=42)
    write_csv(os.path.join(DATASET_DIR, "train_data.csv"), tr_s, tr_y)
    write_csv(os.path.join(DATASET_DIR, "validation_data.csv"), va_s, va_y)
    write_csv(os.path.join(DATASET_DIR, "test_data.csv"), te_s, te_y)
    # the reference README names a FOURTH file — the full dataset
    # (README.md:11; `statistical analysis.py:25` reads it as
    # ki_data.csv).  Bundle it as the exact concatenation of the three
    # splits so full == train+val+test by construction.
    write_csv(os.path.join(DATASET_DIR, "full_data.csv"),
              tr_s + va_s + te_s, list(tr_y) + list(va_y) + list(te_y))
    print(f"Wrote {len(tr_s)}/{len(va_s)}/{len(te_s)} rows (+full) "
          f"to {DATASET_DIR}")


if __name__ == "__main__":
    main()
