"""Featurizer tests: hand-derived expected one-hot vectors."""

import numpy as np

from mgat_graphsage_tpu.chem import (
    NUM_ATOM_FEATURES,
    atom_features_5,
    one_of_k_encoding_unk,
    parse_smiles,
    smiles_to_graph,
    smiles_to_padded_graph,
)


def test_one_of_k_unknown_semantics():
    # In-vocab
    assert one_of_k_encoding_unk("C", ["C", "N", "Unknown"]) == [1, 0, 0]
    # OOV with Unknown bucket
    assert one_of_k_encoding_unk("Zn", ["C", "N", "Unknown"]) == [0, 0, 1]
    # OOV *without* Unknown bucket -> all zeros (reference quirk)
    assert one_of_k_encoding_unk(9, [0, 1, 2]) == [0, 0, 0]


def test_methane_features():
    feats, edges = smiles_to_graph("C")
    assert feats.shape == (1, NUM_ATOM_FEATURES)
    assert edges.shape == (2, 0)
    f = feats[0]
    # symbol C -> index 0 of 10
    assert f[0] == 1 and f[1:10].sum() == 0
    # degree 0 -> index 0 of 7
    assert f[10] == 1 and f[11:17].sum() == 0
    # implicit valence (implicit H count) 4 -> index 4 of [0..6]
    assert f[17 + 4] == 1
    # hybridization SP3 -> index 2 of 5
    assert f[24 + 2] == 1
    # aromatic flag
    assert f[29] == 0
    # total Hs 4 -> index 4 of [0..4]
    assert f[30 + 4] == 1
    assert f.sum() == 5  # five one-hot groups set (aromatic adds 0)


def test_benzene_features():
    feats, edges = smiles_to_graph("c1ccccc1")
    assert feats.shape == (6, 35)
    for f in feats:
        assert f[0] == 1          # C
        assert f[10 + 2] == 1     # degree 2
        assert f[17 + 1] == 1     # 1 implicit H
        assert f[24 + 1] == 1     # SP2
        assert f[29] == 1         # aromatic
        assert f[30 + 1] == 1     # 1 total H
    # benzene: 6 bonds -> 12 directed edges
    assert edges.shape == (2, 12)
    # symmetric edge set
    pairs = set(map(tuple, edges.T.tolist()))
    assert all((b, a) in pairs for (a, b) in pairs)


def test_edge_index_matches_reference_ordering():
    # reference builds edges via dense adj nonzero -> sorted by (src, dst)
    _, edges = smiles_to_graph("CCO")
    expected = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    np.testing.assert_array_equal(edges, expected)


def test_raw_5dim_features():
    mol = parse_smiles("CC(=O)[O-]")
    feats = atom_features_5(mol)
    assert feats.shape == (4, 5)
    # atomic numbers
    np.testing.assert_array_equal(feats[:, 0], [6, 6, 8, 8])
    # formal charge on the last O
    assert feats[3, 3] == -1
    # degree of central carbon
    assert feats[1, 1] == 3


def test_out_of_vocab_degrees_zeroed():
    # S F6-like: degree 6 is in vocab; use a charged P with 5 connections
    feats, _ = smiles_to_graph("FC(F)(F)F")  # CF4: C degree 4
    assert feats[1, 10 + 4] == 1


def test_padded_graph():
    out = smiles_to_padded_graph("CCO", max_nodes=8, max_edges=16)
    nodes, edges, node_mask, edge_mask = out
    assert nodes.shape == (8, 35)
    assert edges.shape == (2, 16)
    assert node_mask.sum() == 3
    assert edge_mask.sum() == 4
    assert nodes[3:].sum() == 0
    # over-budget molecule returns None
    assert smiles_to_padded_graph("CCO", max_nodes=2, max_edges=16) is None


def test_unknown_symbol_maps_to_unknown_bucket():
    feats, _ = smiles_to_graph("C[Se]C")
    se = feats[1]
    assert se[9] == 1  # 'Unknown' bucket
    assert se[0:9].sum() == 0
