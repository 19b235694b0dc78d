"""Compact device-resident dataset storage (data/packed.py).

The claim under test: packing is BIT-EXACT — the per-batch unpack inside
the epoch scan reconstructs the plain float32 batch arrays exactly, so
``dataset_storage="compact"`` is purely a capacity dial with identical
training trajectories.
"""

import numpy as np
import pytest

from mgat_graphsage_tpu.data import MolecularDataset, load_csv, TRAIN_CSV, VAL_CSV
from mgat_graphsage_tpu.data.packed import (
    gather_batch,
    pack_dataset,
    packed_nbytes,
    plain_nbytes,
)
from mgat_graphsage_tpu.train import Trainer, get_config


@pytest.fixture(scope="module")
def fp_data():
    sm, y = load_csv(TRAIN_CSV)
    vs, vy = load_csv(VAL_CSV)
    train = MolecularDataset(sm[:128], y[:128], fit_scaler=True,
                             fingerprint="ecfp1024", verbose=False)
    val = MolecularDataset(vs[:64], vy[:64], scaler=train.scaler,
                           fingerprint="ecfp1024",
                           max_nodes=train.max_nodes,
                           max_edges=train.max_edges, verbose=False)
    return train, val


def _plain_dict(ds):
    return {"nodes": ds.nodes, "edges": ds.edges,
            "node_mask": ds.node_mask, "edge_mask": ds.edge_mask,
            "fp": ds.fp, "y": ds.y, "y_orig": ds.y_orig}


def test_pack_unpack_bit_exact(fp_data):
    train, _ = fp_data
    packed = pack_dataset(train)
    idx = np.asarray([0, 3, 7, 127, 64, 1], np.int32)
    fp_dim = train.fp.shape[1]
    got = {k: np.asarray(v)
           for k, v in gather_batch(packed, idx, fp_dim).items()}
    want = {k: np.asarray(v)
            for k, v in gather_batch(_plain_dict(train), idx,
                                     fp_dim).items()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].dtype == want[k].dtype, k
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_pack_unpack_bit_exact_5dim_featurizer():
    # the 5-dim raw featurizer carries atomic numbers and formal charges
    # (can be negative) — still small ints, still exact under int8
    sm, y = load_csv(TRAIN_CSV)
    ds = MolecularDataset(sm[:64] + ["[O-]C(=O)c1ccccc1"],
                          np.concatenate([y[:64], [5.0]]),
                          fit_scaler=True, fingerprint=None,
                          featurizer="5", verbose=False)
    packed = pack_dataset(ds)
    idx = np.arange(len(ds), dtype=np.int32)
    got = gather_batch(packed, idx, ds.fp.shape[1])
    want = gather_batch(_plain_dict(ds), idx, ds.fp.shape[1])
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


def test_non_binary_fingerprint_falls_back_to_f32(fp_data):
    train, _ = fp_data
    import copy
    ds = copy.copy(train)
    ds.fp = train.fp.copy()
    ds.fp[0, 0] = 0.37  # descriptor-valued stream (e.g. BCI)
    packed = pack_dataset(ds)
    assert "fp" in packed and "fp_packed" not in packed
    assert packed["fp"].dtype == np.float32
    idx = np.asarray([0, 1], np.int32)
    got = gather_batch(packed, idx, ds.fp.shape[1])
    np.testing.assert_array_equal(np.asarray(got["fp"]), ds.fp[idx])


def test_odd_width_fingerprint_roundtrip(fp_data):
    # MACCS is 167 bits — not a multiple of 8; the unpack must trim the
    # padded byte tail
    train, _ = fp_data
    import copy
    ds = copy.copy(train)
    rng = np.random.default_rng(0)
    ds.fp = rng.integers(0, 2, size=(train.n, 167)).astype(np.float32)
    ds.fp_dim = 167
    packed = pack_dataset(ds)
    assert packed["fp_packed"].shape == (train.n, 21)
    idx = np.asarray([5, 2, 9], np.int32)
    got = gather_batch(packed, idx, 167)
    assert np.asarray(got["fp"]).shape == (3, 167)
    np.testing.assert_array_equal(np.asarray(got["fp"]), ds.fp[idx])


def test_compression_factor(fp_data):
    train, _ = fp_data
    factor = plain_nbytes(train) / packed_nbytes(train)
    assert factor > 4.0, factor


def test_compact_training_trajectory_identical(fp_data):
    train, val = fp_data
    cfg = get_config("flagship", epochs=2, batch_size=32)
    h32 = Trainer(cfg, train, val).fit(verbose=False)[2]
    hc = Trainer(cfg.replace(dataset_storage="compact"),
                 train, val).fit(verbose=False)[2]
    for a, b in zip(h32, hc):
        assert a["train_loss"] == b["train_loss"]
        assert a["val_mse"] == b["val_mse"]
        assert a["original_mse"] == b["original_mse"]


def test_pack_rejects_non_integral_nodes(fp_data):
    train, _ = fp_data
    import copy
    ds = copy.copy(train)
    ds.nodes = train.nodes.copy()
    ds.nodes[0, 0, 0] = 0.5
    with pytest.raises(ValueError, match="non-integral"):
        pack_dataset(ds)


def test_pack_rejects_non_leading_ones_mask(fp_data):
    """Counts can only represent leading-ones masks; a scattered mask
    must be a loud error, not silent mask corruption (the packed path's
    bit-exact guarantee)."""
    train, _ = fp_data
    import copy
    ds = copy.copy(train)
    ds.node_mask = train.node_mask.copy()
    ds.node_mask[0, :] = 0.0
    ds.node_mask[0, -1] = 1.0          # same count, wrong positions
    with pytest.raises(ValueError, match="leading-ones"):
        pack_dataset(ds)
