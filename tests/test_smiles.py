"""SMILES parser + perception tests against hand-derived chemistry facts."""

import numpy as np
import pytest

from mgat_graphsage_tpu.chem import (
    MolFromSmiles,
    SmilesParseError,
    parse_smiles,
)
from mgat_graphsage_tpu.chem.smiles import SP, SP2, SP3


def test_methane_and_simple_chains():
    m = parse_smiles("C")
    assert m.GetNumAtoms() == 1
    a = m.GetAtomWithIdx(0)
    assert a.GetSymbol() == "C"
    assert a.GetTotalNumHs() == 4
    assert a.GetDegree() == 0
    assert a.GetHybridization() == SP3

    m = parse_smiles("CCO")  # ethanol
    assert m.GetNumAtoms() == 3
    assert [a.GetSymbol() for a in m.GetAtoms()] == ["C", "C", "O"]
    assert [a.GetTotalNumHs() for a in m.GetAtoms()] == [3, 2, 1]
    assert [a.GetDegree() for a in m.GetAtoms()] == [1, 2, 1]
    assert m.GetNumBonds() == 2


def test_double_triple_bonds():
    m = parse_smiles("C=C")  # ethylene
    assert all(a.GetTotalNumHs() == 2 for a in m.GetAtoms())
    assert all(a.GetHybridization() == SP2 for a in m.GetAtoms())
    assert m.GetBonds()[0].order == 2

    m = parse_smiles("C#N")  # HCN
    assert m.GetAtomWithIdx(0).GetTotalNumHs() == 1
    assert m.GetAtomWithIdx(1).GetTotalNumHs() == 0
    assert all(a.GetHybridization() == SP for a in m.GetAtoms())


def test_branching():
    m = parse_smiles("CC(C)C")  # isobutane
    assert m.GetNumAtoms() == 4
    center = m.GetAtomWithIdx(1)
    assert center.GetDegree() == 3
    assert center.GetTotalNumHs() == 1

    m = parse_smiles("CC(=O)O")  # acetic acid
    assert [a.GetSymbol() for a in m.GetAtoms()] == ["C", "C", "O", "O"]
    assert m.GetAtomWithIdx(2).GetTotalNumHs() == 0
    assert m.GetAtomWithIdx(3).GetTotalNumHs() == 1
    assert m.GetAtomWithIdx(1).GetHybridization() == SP2


def test_aromatic_lowercase_benzene():
    m = parse_smiles("c1ccccc1")
    assert m.GetNumAtoms() == 6
    assert all(a.GetIsAromatic() for a in m.GetAtoms())
    assert all(a.GetTotalNumHs() == 1 for a in m.GetAtoms())
    assert all(a.GetHybridization() == SP2 for a in m.GetAtoms())
    assert all(a.IsInRing() for a in m.GetAtoms())
    assert m.GetNumBonds() == 6
    assert m.NumRings() == 1


def test_kekule_benzene_aromatized():
    m = parse_smiles("C1=CC=CC=C1")
    assert all(a.GetIsAromatic() for a in m.GetAtoms())
    assert all(a.GetTotalNumHs() == 1 for a in m.GetAtoms())


def test_pyridine_pyrrole_furan():
    m = parse_smiles("c1ccncc1")  # pyridine
    n_atom = [a for a in m.GetAtoms() if a.GetSymbol() == "N"][0]
    assert n_atom.GetIsAromatic()
    assert n_atom.GetTotalNumHs() == 0

    m = parse_smiles("c1cc[nH]c1")  # pyrrole
    n_atom = [a for a in m.GetAtoms() if a.GetSymbol() == "N"][0]
    assert n_atom.GetTotalNumHs() == 1
    assert n_atom.GetIsAromatic()

    m = parse_smiles("c1ccoc1")  # furan
    o_atom = [a for a in m.GetAtoms() if a.GetSymbol() == "O"][0]
    assert o_atom.GetTotalNumHs() == 0
    assert o_atom.GetIsAromatic()


def test_charges_and_brackets():
    m = parse_smiles("[NH4+]")
    a = m.GetAtomWithIdx(0)
    assert a.GetFormalCharge() == 1
    assert a.GetTotalNumHs() == 4

    m = parse_smiles("CC(=O)[O-]")
    assert m.GetAtomWithIdx(3).GetFormalCharge() == -1
    assert m.GetAtomWithIdx(3).GetTotalNumHs() == 0

    m = parse_smiles("[13CH4]")
    assert m.GetAtomWithIdx(0).isotope == 13
    assert m.GetAtomWithIdx(0).GetTotalNumHs() == 4


def test_two_letter_atoms_and_halogens():
    m = parse_smiles("ClCCBr")
    assert [a.GetSymbol() for a in m.GetAtoms()] == ["Cl", "C", "C", "Br"]
    assert m.GetAtomWithIdx(0).GetTotalNumHs() == 0

    m = parse_smiles("C[Se]C")
    assert m.GetAtomWithIdx(1).GetSymbol() == "Se"


def test_ring_closures_and_percent():
    m = parse_smiles("C1CCCCC1")  # cyclohexane
    assert m.GetNumBonds() == 6
    assert all(a.IsInRing() for a in m.GetAtoms())
    assert all(a.GetTotalNumHs() == 2 for a in m.GetAtoms())
    assert all(a.GetHybridization() == SP3 for a in m.GetAtoms())

    m = parse_smiles("C%10CCCCC%10")
    assert m.GetNumBonds() == 6


def test_fused_rings_naphthalene():
    m = parse_smiles("c1ccc2ccccc2c1")
    assert m.GetNumAtoms() == 10
    assert m.GetNumBonds() == 11
    assert m.NumRings() == 2
    assert all(a.GetIsAromatic() for a in m.GetAtoms())
    fusion = [a for a in m.GetAtoms() if a.GetDegree() == 3]
    assert len(fusion) == 2
    assert all(a.GetTotalNumHs() == 0 for a in fusion)


def test_disconnected_fragments():
    m = parse_smiles("[Na+].[Cl-]")
    assert m.GetNumAtoms() == 2
    assert m.GetNumBonds() == 0

    m = parse_smiles("CCO.CC")
    assert m.GetNumAtoms() == 5
    assert m.GetNumBonds() == 3


def test_explicit_h_atoms_folded():
    m = parse_smiles("[H]OC([H])([H])[H]")  # methanol with explicit Hs
    assert m.GetNumAtoms() == 2
    o = [a for a in m.GetAtoms() if a.GetSymbol() == "O"][0]
    c = [a for a in m.GetAtoms() if a.GetSymbol() == "C"][0]
    assert o.GetTotalNumHs() == 1
    assert c.GetTotalNumHs() == 3


def test_caffeine():
    m = parse_smiles("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
    assert m.GetNumAtoms() == 14
    syms = sorted(a.GetSymbol() for a in m.GetAtoms())
    assert syms.count("N") == 4 and syms.count("O") == 2 and syms.count("C") == 8
    assert m.NumRings() == 2
    # the three methyl carbons
    methyls = [a for a in m.GetAtoms() if a.GetTotalNumHs() == 3]
    assert len(methyls) == 3


def test_aspirin():
    m = parse_smiles("CC(=O)Oc1ccccc1C(=O)O")
    assert m.GetNumAtoms() == 13
    assert m.NumRings() == 1
    aromatic = [a for a in m.GetAtoms() if a.GetIsAromatic()]
    assert len(aromatic) == 6


def test_stereo_markers_ignored_gracefully():
    m = parse_smiles("C/C=C/C")  # trans-2-butene
    assert m.GetNumAtoms() == 4
    assert m.GetBonds()[1].order == 2
    m = parse_smiles("C[C@H](N)C(=O)O")  # L-alanine
    assert m.GetNumAtoms() == 6
    c = m.GetAtomWithIdx(1)
    assert c.GetTotalNumHs() == 1


def test_invalid_smiles():
    for bad in ["", "C(", "C1CC", "CX", "C)(", "[C", "%5C", "1CC"]:
        assert MolFromSmiles(bad) is None
    with pytest.raises(SmilesParseError):
        parse_smiles("C(C")


def test_sulfur_valences():
    m = parse_smiles("CS(=O)(=O)C")  # dimethyl sulfone: S valence 6
    s = [a for a in m.GetAtoms() if a.GetSymbol() == "S"][0]
    assert s.GetTotalNumHs() == 0
    m = parse_smiles("CSC")  # thioether
    s = [a for a in m.GetAtoms() if a.GetSymbol() == "S"][0]
    assert s.GetTotalNumHs() == 0
    m = parse_smiles("CS")  # methanethiol
    s = [a for a in m.GetAtoms() if a.GetSymbol() == "S"][0]
    assert s.GetTotalNumHs() == 1


def test_nitro_group_and_amide():
    m = parse_smiles("C[N+](=O)[O-]")  # nitromethane
    n = [a for a in m.GetAtoms() if a.GetSymbol() == "N"][0]
    assert n.GetFormalCharge() == 1
    assert n.GetTotalNumHs() == 0
    m = parse_smiles("CC(=O)N")  # acetamide
    n = [a for a in m.GetAtoms() if a.GetSymbol() == "N"][0]
    assert n.GetTotalNumHs() == 2


# --- round-2 regressions: advisor findings on hybridization / implicit H ---

def test_hybridization_hypervalent_s_p():
    """Steric-number model: hypervalent S/P are SP3 like RDKit reports
    (sigma bonds + lone pairs = 4 orbitals), not SP/SP2 as a naive
    multiple-bond-count rule yields (ADVICE.md round 1, smiles.py:474)."""
    s = parse_smiles("CS(=O)(=O)N").GetAtomWithIdx(1)   # sulfonamide S
    assert s.GetHybridization() == "SP3"
    s = parse_smiles("CS(C)=O").GetAtomWithIdx(1)       # sulfoxide S
    assert s.GetHybridization() == "SP3"
    p = parse_smiles("OP(=O)(O)O").GetAtomWithIdx(1)    # phosphate P
    assert p.GetHybridization() == "SP3"
    s = parse_smiles("CS(=O)(=O)C").GetAtomWithIdx(1)   # sulfone S
    assert s.GetHybridization() == "SP3"


def test_hybridization_steric_basics():
    mol = parse_smiles("CC#N")
    assert mol.GetAtomWithIdx(1).GetHybridization() == "SP"
    assert mol.GetAtomWithIdx(2).GetHybridization() == "SP"  # nitrile N: 1 LP
    mol = parse_smiles("C=C")
    assert mol.GetAtomWithIdx(0).GetHybridization() == "SP2"
    assert parse_smiles("COC").GetAtomWithIdx(1).GetHybridization() == "SP3"
    assert parse_smiles("CC=O").GetAtomWithIdx(2).GetHybridization() == "SP2"
    assert parse_smiles("C[NH3+]").GetAtomWithIdx(1).GetHybridization() == "SP3"
    # isolated / degree-0 atoms
    assert parse_smiles("[Na+]").GetAtomWithIdx(0).GetHybridization() == "S"


def test_kekule_pyrrole_nitrogen_keeps_hydrogen():
    """Lone-pair donors skip the aromatic valence bump (ADVICE.md round 1,
    smiles.py:448): Kekule-written pyrrole-type N has GetTotalNumHs() == 1,
    matching RDKit; pyridine-type N stays at 0."""
    for smi, n_idx in [("C1=CC=CN1", 4), ("C1=CNC=C1", 2)]:
        n = parse_smiles(smi).GetAtomWithIdx(n_idx)
        assert n.GetIsAromatic()
        assert n.GetTotalNumHs() == 1, smi
    # imidazole: one donor N-H, one pyridine-type N
    mol = parse_smiles("C1=CN=CN1")
    assert mol.GetAtomWithIdx(4).GetTotalNumHs() == 1
    assert mol.GetAtomWithIdx(2).GetTotalNumHs() == 0
    # lowercase forms agree
    low = parse_smiles("c1cc[nH]c1")
    assert low.GetAtomWithIdx(3).GetTotalNumHs() == 1


def test_fused_kekule_aromatization_fixpoint():
    """Indole written in Kekule form: the pyrrole ring aromatizes even when
    the benzene ring is processed first (aromatic fused bonds count as pi
    contributors; iterated to fixpoint)."""
    mol = parse_smiles("C1=CC2=C(C=C1)C=CN2")
    assert all(a.GetIsAromatic() for a in mol.GetAtoms())
    n = [a for a in mol.GetAtoms() if a.GetSymbol() == "N"][0]
    assert n.GetTotalNumHs() == 1
    assert n.GetHybridization() == "SP2"
    # benzofuran
    mol = parse_smiles("C1=CC2=C(C=C1)C=CO2")
    assert all(a.GetIsAromatic() for a in mol.GetAtoms())


def test_kekule_pyridone_aromatizes():
    """RDKit's aromaticity model: a ring atom with an exocyclic double
    bond to a more electronegative atom contributes ZERO pi electrons —
    it does not block aromatization.  2-pyridone and uracil are aromatic
    (Kekule or aromatic input alike); quinone fails Hueckel at 4
    electrons."""
    for smi in ("O=C1C=CC=CN1", "O=c1cccc[nH]1"):
        mol = parse_smiles(smi)
        ring_atoms = [a for a in mol.GetAtoms() if a.GetSymbol() != "O"]
        assert all(a.GetIsAromatic() for a in ring_atoms), smi
        n = [a for a in mol.GetAtoms() if a.GetSymbol() == "N"][0]
        assert n.GetTotalNumHs() == 1, smi
    # uracil: both N-H retained, ring aromatic
    mol = parse_smiles("O=C1NC=CC(=O)N1")
    ns = [a for a in mol.GetAtoms() if a.GetSymbol() == "N"]
    assert all(n.GetIsAromatic() and n.GetTotalNumHs() == 1 for n in ns)
    # caffeine in Kekule form == aromatic form perception
    mol = parse_smiles("CN1C=NC2=C1C(=O)N(C)C(=O)N2C")
    assert sum(a.GetIsAromatic() for a in mol.GetAtoms()) == 9
    # para-benzoquinone: 4 pi electrons -> NOT aromatic
    mol = parse_smiles("O=C1C=CC(=O)C=C1")
    assert not any(a.GetIsAromatic() for a in mol.GetAtoms())
    # fulvene-type exocyclic C=C still blocks (not aromatic in RDKit)
    mol = parse_smiles("C=C1C=CC=C1")
    assert not any(a.GetIsAromatic() for a in mol.GetAtoms())


def test_macrocycle_ring_sizes():
    """MAX_RING raised 8 -> 24 (VERDICT round 1 weak #6): macrocycle ring
    sizes are perceived; in_ring stays exact either way."""
    mol = parse_smiles("C1CCCCCCCCCCC1")  # cyclododecane
    for a in mol.GetAtoms():
        assert a.IsInRing()
        assert a.ring_sizes == (12,)
    mol = parse_smiles("C1" + "C" * 13 + "1")  # 14-ring (erythromycin-size)
    assert mol.GetAtomWithIdx(0).ring_sizes == (14,)
    # beyond the bound: membership exact, sizes empty (documented behavior)
    mol = parse_smiles("C1" + "C" * 29 + "1")  # 30-ring
    assert mol.GetAtomWithIdx(0).IsInRing()
    assert mol.GetAtomWithIdx(0).ring_sizes == ()


def test_valence_validation_rejects_impossible_neutrals():
    """Total-bond-order valence validation (VERDICT r2 -> r3 #1a): RDKit
    sanitization rejects over-valent neutral atoms; this parser must too.
    The round-2 frozen splits contained trivalent neutral oxygens produced
    by the synth generator's carbonyl-O attachment bug."""
    import pytest as _pytest
    bad = [
        "CO=C",                       # trivalent neutral O
        "CC(=O)O=C1NC(=O)c2ccccc2N1Br",  # the synth-bug shape itself
        "C(C)(C)(C)(C)C",             # pentavalent neutral C
        "CF(C)C",                     # divalent neutral F
        "[OH3]",                      # bracket NEUTRAL over-valent O
    ]
    for smi in bad:
        with _pytest.raises(SmilesParseError):
            parse_smiles(smi)


def test_valence_validation_keeps_valid_chemistry():
    """Charged species, hypervalent S/P/N within Daylight valences, and
    aromatic lone-pair donors must all still parse."""
    good = [
        "O=[N+]([O-])c1ccccc1",   # nitro, charged form
        "N(=O)=O",                # nitro, neutral pentavalent N (Daylight 5)
        "CS(=O)(=O)N",            # sulfonamide: S valence 6
        "OP(=O)(O)O",             # phosphate: P valence 5
        "c1cc[nH]c1",             # pyrrole lone-pair donor keeps its H
        "c1ccn2ccccc12",          # indolizine bridgehead aromatic N
        "[NH4+].[Cl-]",           # charged bracket atoms exempt
        "O=C1NC=CC(=O)N1",        # uracil (aromatized Kekule ring)
        "C[S+](C)C",              # sulfonium: charged, exempt
    ]
    for smi in good:
        parse_smiles(smi)  # must not raise
