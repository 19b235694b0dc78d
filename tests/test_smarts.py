"""Mini-SMARTS matcher tests against hand-derived match sets."""

from mgat_graphsage_tpu.chem import parse_smiles
from mgat_graphsage_tpu.explain.smarts import find_matches, has_match


def test_single_atom_patterns():
    mol = parse_smiles("CCO")
    assert len(find_matches(mol, "O")) == 1
    assert len(find_matches(mol, "C")) == 2
    assert len(find_matches(mol, "N")) == 0
    # aromatic O does not match aliphatic 'O'
    furan = parse_smiles("c1ccoc1")
    assert len(find_matches(furan, "O")) == 0
    assert len(find_matches(furan, "o")) == 1


def test_bond_orders():
    mol = parse_smiles("CC(=O)O")  # acetic acid
    assert has_match(mol, "C=O")
    assert has_match(mol, "C(=O)O")
    assert not has_match(mol, "C#N")
    # carboxyl matches once (uniquified by atom set)
    assert len(find_matches(mol, "C(=O)O")) == 1


def test_benzene_ring_pattern():
    mol = parse_smiles("c1ccccc1C")  # toluene
    m = find_matches(mol, "c1ccccc1")
    assert len(m) == 1
    assert set(m[0]) == {0, 1, 2, 3, 4, 5}
    # aliphatic ring pattern does not match aromatic ring
    assert not has_match(mol, "C1CCCCC1")


def test_pyridine_vs_benzene():
    pyr = parse_smiles("c1ccncc1")
    assert has_match(pyr, "c1ccncc1")
    assert not has_match(pyr, "c1ccccc1")
    benz = parse_smiles("c1ccccc1")
    assert not has_match(benz, "c1ccncc1")


def test_alternation_and_h_count():
    # ether [C,c]O[C,c]
    anisole = parse_smiles("COc1ccccc1")
    assert has_match(anisole, "[C,c]O[C,c]")
    ethanol = parse_smiles("CCO")
    assert not has_match(ethanol, "[C,c]O[C,c]")
    # [nH] pyrrole-type only
    pyrrole = parse_smiles("c1cc[nH]c1")
    pyridine = parse_smiles("c1ccncc1")
    assert has_match(pyrrole, "[nH]")
    assert not has_match(pyridine, "[nH]")


def test_charge():
    m = parse_smiles("CC(=O)[O-]")
    assert has_match(m, "[O-]")
    assert not has_match(m, "[N+]")


def test_amide_and_ester():
    aspirin = parse_smiles("CC(=O)Oc1ccccc1C(=O)O")
    assert has_match(aspirin, "C(=O)O[C,c]")   # ester
    assert has_match(aspirin, "C(=O)O")        # carboxyl
    acetamide = parse_smiles("CC(=O)N")
    assert has_match(acetamide, "C(=O)N")
    assert not has_match(acetamide, "C(=O)O[C,c]")


def test_fused_ring_indole():
    indole = parse_smiles("c1ccc2[nH]ccc2c1")
    assert has_match(indole, "c1ccc2[nH]ccc2c1")
    assert has_match(indole, "[nH]")
    assert has_match(indole, "c1ccccc1")  # benzo ring


def test_methylene_count():
    # 'CC' on propane: pairs (0,1), (1,2) -> 2 unique atom sets
    propane = parse_smiles("CCC")
    assert len(find_matches(propane, "CC")) == 2


def test_saturated_heterocycles():
    pip = parse_smiles("C1CCNCC1")
    assert has_match(pip, "C1CCNCC1")
    morph = parse_smiles("C1COCCN1")
    assert has_match(morph, "C1COCCN1")
    assert not has_match(pip, "C1COCCN1")


def test_atomic_num_and_wildcard():
    mol = parse_smiles("CCO")
    assert len(find_matches(mol, "[#8]")) == 1
    assert len(find_matches(mol, "*")) == 3
    assert len(find_matches(mol, "C~O")) == 1
