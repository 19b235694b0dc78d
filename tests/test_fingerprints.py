"""Fingerprint + descriptor tests."""

import numpy as np
import pytest

from mgat_graphsage_tpu.chem import parse_smiles
from mgat_graphsage_tpu.chem import descriptors as D
from mgat_graphsage_tpu.chem.fingerprints import (
    get_bci_fingerprint,
    get_ecfp,
    get_fcfp,
    get_maccs,
    get_morgan_fingerprint,
    get_smifp,
    morgan_fingerprint,
)


ASPIRIN = "CC(=O)Oc1ccccc1C(=O)O"
CAFFEINE = "Cn1cnc2c1c(=O)n(C)c(=O)n2C"


def test_ecfp_shape_and_determinism():
    fp1 = get_ecfp(ASPIRIN)
    fp2 = get_ecfp(ASPIRIN)
    assert fp1.shape == (1, 1024)
    assert fp1.dtype == np.float32
    np.testing.assert_array_equal(fp1, fp2)
    assert set(np.unique(fp1)) <= {0.0, 1.0}
    assert fp1.sum() > 5  # nontrivial


def test_ecfp_discriminates_molecules():
    a = get_ecfp(ASPIRIN)
    b = get_ecfp(CAFFEINE)
    assert not np.array_equal(a, b)


def test_ecfp_radius_monotone():
    # larger radius sets at least as many bits (new environments)
    mol = parse_smiles(ASPIRIN)
    f0 = morgan_fingerprint(mol, radius=0).sum()
    f1 = morgan_fingerprint(mol, radius=1).sum()
    f2 = morgan_fingerprint(mol, radius=2).sum()
    assert f0 <= f1 <= f2


def test_ecfp_substructure_sharing():
    # ethanol and propanol share radius-0/1 environments
    a = get_ecfp("CCO", radius=1)
    b = get_ecfp("CCCO", radius=1)
    shared = (a * b).sum()
    assert shared >= 3


def test_morgan_2048_and_alias():
    fp = get_morgan_fingerprint(ASPIRIN, nBits=2048)
    assert fp.shape == (1, 2048)
    np.testing.assert_array_equal(get_ecfp(ASPIRIN), get_morgan_fingerprint(ASPIRIN))


def test_fcfp_differs_from_ecfp():
    assert not np.array_equal(get_fcfp(ASPIRIN), get_ecfp(ASPIRIN))
    assert get_fcfp(ASPIRIN).shape == (1, 1024)


def test_maccs():
    fp = get_maccs(ASPIRIN)
    assert fp.shape == (1, 167)
    assert fp[0, 0] == 0  # bit 0 always unset
    v = fp[0]
    assert v[1] == 1  # has C
    assert v[3] == 1  # has O
    assert v[2] == 0  # no N in aspirin
    caffeine = get_maccs(CAFFEINE)[0]
    assert caffeine[2] == 1  # N present
    assert not np.array_equal(v, caffeine)


def test_smifp():
    fp = get_smifp(ASPIRIN)
    assert fp.shape == (1, 1024)
    np.testing.assert_array_equal(fp, get_smifp(ASPIRIN))
    assert fp.sum() > 10
    assert not np.array_equal(fp, get_smifp(CAFFEINE))


def test_bci():
    fp = get_bci_fingerprint(ASPIRIN)
    assert fp.shape == (1, 1024)
    # first 512: binary layered FP
    assert set(np.unique(fp[0, :512])) <= {0.0, 1.0}
    # descriptor half contains MolWt at position 512
    assert fp[0, 512] == pytest.approx(D.mol_weight(parse_smiles(ASPIRIN)), rel=1e-5)


def test_descriptors_aspirin():
    mol = parse_smiles(ASPIRIN)
    assert D.mol_weight(mol) == pytest.approx(180.159, abs=0.5)
    assert D.num_h_donors(mol) == 1
    assert D.num_h_acceptors(mol) == 3  # RDKit Lipinski: acid OH excluded
    assert D.heavy_atom_count(mol) == 13
    assert D.ring_count(mol) == 1
    assert D.num_aromatic_rings(mol) == 1
    assert D.num_aliphatic_rings(mol) == 0
    assert D.num_rotatable_bonds(mol) in (2, 3)  # RDKit says 2 (ester C-O rigid-ish)
    assert 50 < D.tpsa(mol) < 75  # RDKit: 63.6
    assert D.num_heteroatoms(mol) == 4


def test_descriptors_caffeine():
    mol = parse_smiles(CAFFEINE)
    assert D.mol_weight(mol) == pytest.approx(194.19, abs=0.5)
    assert D.num_h_donors(mol) == 0
    assert D.ring_count(mol) == 2
    assert D.num_rotatable_bonds(mol) == 0


def test_chi_and_kappa_ethane_like():
    # n-butane: chi0 = 2/sqrt(1) + 2/sqrt(2); chi1 = 2/sqrt(2) + 1/2
    mol = parse_smiles("CCCC")
    assert D.chi0(mol) == pytest.approx(2 + 2 / np.sqrt(2), rel=1e-6)
    assert D.chi1(mol) == pytest.approx(2 / np.sqrt(2) + 0.5, rel=1e-6)
    # kappa1 for linear alkane = A(A-1)^2/(A-1)^2 = A
    assert D.kappa1(mol) == pytest.approx(4.0, rel=1e-6)


def test_balaban_butane():
    # n-butane BalabanJ is a known value ~1.975
    mol = parse_smiles("CCCC")
    assert D.balaban_j(mol) == pytest.approx(1.9746, abs=0.01)


def test_bci_descriptor_block_size():
    mol = parse_smiles(ASPIRIN)
    block = D.bci_descriptor_block(mol)
    assert len(block) == 48
    assert all(np.isfinite(block))
