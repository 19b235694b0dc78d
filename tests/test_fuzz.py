"""Robustness fuzzing: the parser must never crash, only accept or
cleanly reject; accepted molecules must featurize and round-trip."""

import numpy as np

from mgat_graphsage_tpu.chem import MolFromSmiles, smiles_to_graph
from mgat_graphsage_tpu.chem.write import mol_to_smiles
from mgat_graphsage_tpu.data.synth import generate_dataset

_CHARS = list("CNOSPFIclnosp()[]=#123456789%+-@/\\.BrH ")


def test_random_garbage_never_crashes():
    rng = np.random.default_rng(0)
    accepted = 0
    for _ in range(3000):
        n = int(rng.integers(1, 30))
        s = "".join(rng.choice(_CHARS, size=n))
        mol = MolFromSmiles(s)  # must not raise
        if mol is not None:
            accepted += 1
            feats, edges = smiles_to_graph(s)
            assert feats.shape[0] == mol.GetNumAtoms()
            assert np.all(np.isfinite(feats))
            # writer round-trips whatever the parser accepted
            m2 = MolFromSmiles(mol_to_smiles(mol))
            assert m2 is not None
            assert m2.GetNumAtoms() == mol.GetNumAtoms()
    # sanity: the fuzzer does produce some valid strings
    assert accepted > 20


def test_generator_output_always_valid():
    smiles, _ = generate_dataset(300, seed=123)
    for s in smiles:
        mol = MolFromSmiles(s)
        assert mol is not None, s
        feats, edges = smiles_to_graph(s)
        # every atom's feature row has the 4-5 expected one-hot groups
        assert np.all(feats.sum(axis=1) >= 4), s
        # edges reference valid atoms
        if edges.size:
            assert edges.max() < feats.shape[0]


def test_pathological_inputs():
    cases = [
        "C" * 200,                      # long chain
        "C1" + "C" * 90 + "1",          # huge ring
        "[" * 50, "(" * 50, "%99" * 10,
        "c1ccccc1" * 10,                # many rings reusing digit 1
        "[C@@H](F)(Cl)Br",
        "C.C.C.C.C",
        "\t", "  ", "C C",              # whitespace forms
    ]
    for s in cases:
        mol = MolFromSmiles(s)          # accept or reject, never crash
        if mol is not None:
            smiles_to_graph(s)
