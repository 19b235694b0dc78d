"""Native C++ featurizer: bit-identical to the Python implementation."""

import numpy as np
import pytest

from mgat_graphsage_tpu.chem import smiles_to_graph
from mgat_graphsage_tpu.chem.fingerprints import get_ecfp, get_fcfp
from mgat_graphsage_tpu.chem.native import (
    featurize_batch_native,
    native_available,
)
from mgat_graphsage_tpu.data import TRAIN_CSV, load_csv

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")

CORPUS = [
    "C", "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "C1CC2CCC1CC2", "CS(=O)(=O)c1ccccc1",
    "c1cc[nH]c1", "C1CN(CCc2ccccc2)CCN1C", "[NH4+].[Cl-]",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "N#Cc1ccccc1F", "C/C=C/C(=O)O",
    "c1ccc2[nH]c(Sc3ccccc3)nc2c1", "OCC(O)C(O)C(O)C(O)CO",
]


def test_exact_match_on_corpus():
    res = featurize_batch_native(CORPUS, 35, 64, 160, fp_bits=1024)
    nodes, edges, node_mask, edge_mask, fp, status = res
    for i, smi in enumerate(CORPUS):
        pf, pe = smiles_to_graph(smi)
        assert status[i] == pf.shape[0], smi
        np.testing.assert_array_equal(
            nodes[i, :pf.shape[0]], pf, err_msg=smi)
        assert nodes[i, pf.shape[0]:].sum() == 0
        np.testing.assert_array_equal(
            edges[i, :, :pe.shape[1]], pe, err_msg=smi)
        assert int(edge_mask[i].sum()) == pe.shape[1]
        pfp = get_ecfp(smi).reshape(-1)
        np.testing.assert_array_equal(fp[i], pfp, err_msg=smi)


def test_exact_match_on_dataset_sample():
    sm, _ = load_csv(TRAIN_CSV)
    sample = sm[:150]
    res = featurize_batch_native(sample, 35, 96, 224, fp_bits=1024)
    nodes, edges, node_mask, edge_mask, fp, status = res
    mismatches = 0
    for i, smi in enumerate(sample):
        pf, pe = smiles_to_graph(smi)
        if status[i] != pf.shape[0]:
            mismatches += 1
            continue
        if not np.array_equal(nodes[i, :pf.shape[0]], pf):
            mismatches += 1
        if not np.array_equal(fp[i], get_ecfp(smi).reshape(-1)):
            mismatches += 1
    assert mismatches == 0


def test_fcfp_variant():
    res = featurize_batch_native(CORPUS[:5], 35, 64, 160, fp_bits=1024,
                                 use_features=True)
    fp = res[4]
    for i, smi in enumerate(CORPUS[:5]):
        np.testing.assert_array_equal(fp[i], get_fcfp(smi).reshape(-1),
                                      err_msg=smi)


def test_raw5_featurizer():
    res = featurize_batch_native(CORPUS[:8], 5, 64, 160)
    nodes, _, _, _, _, status = res
    for i, smi in enumerate(CORPUS[:8]):
        pf, _ = smiles_to_graph(smi, featurizer="5")
        assert status[i] == pf.shape[0]
        np.testing.assert_array_equal(nodes[i, :pf.shape[0]], pf,
                                      err_msg=smi)


def test_error_codes():
    res = featurize_batch_native(["C1CC(", "xx", "CCO"], 35, 64, 160)
    status = res[5]
    assert status[0] < 0 and status[1] < 0
    assert status[2] == 3
    # over budget
    res = featurize_batch_native(["CCCCCCCCCC"], 35, 4, 160)
    assert res[5][0] == -2
