"""Atom featurizers and graph builders (reference parity layer).

Reimplements the featurization the reference duplicates in every script:

- the 35-dim one-hot atom featurizer + dense-adjacency graph builder of
  reference ``train.py:19-55`` (and ~40 verbatim copies, e.g. ``test.py:14-41``,
  ``gnn/gat.py:18-41``);
- the 5-dim "raw" featurizer used only by the GCN baseline
  (reference ``gnn/gcn.py:14-40``).

Unlike the reference, output is **fixed-shape padded** NumPy arrays so that
XLA compiles the downstream model exactly once per (N_max, E_max) bucket:
``nodes [N_max, F]``, ``edges [2, E_max]`` (COO, both directions, padded with
self-referential index N_max-1 entries masked out by ``edge_mask``), plus a
``node_mask``.  Dense adjacency for MXU-friendly message passing is built on
device from the edge list (see ``ops/graph.py``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .smiles import Mol, MolFromSmiles, SmilesParseError, parse_smiles

__all__ = [
    "ATOM_SYMBOLS",
    "DEGREES",
    "IMPLICIT_VALENCES",
    "HYBRIDIZATIONS",
    "TOTAL_HS",
    "NUM_ATOM_FEATURES",
    "NUM_RAW_FEATURES",
    "one_of_k_encoding_unk",
    "atom_features_35",
    "atom_features_5",
    "mol_to_graph",
    "smiles_to_graph",
    "smiles_to_padded_graph",
]

# Vocabularies — byte-for-byte the lists from reference train.py:34-42.
ATOM_SYMBOLS = ["C", "N", "O", "S", "F", "P", "Cl", "Br", "I", "Unknown"]
DEGREES = [0, 1, 2, 3, 4, 5, 6]
IMPLICIT_VALENCES = [0, 1, 2, 3, 4, 5, 6]
HYBRIDIZATIONS = ["SP", "SP2", "SP3", "SP3D", "SP3D2"]
TOTAL_HS = [0, 1, 2, 3, 4]

NUM_ATOM_FEATURES = (
    len(ATOM_SYMBOLS) + len(DEGREES) + len(IMPLICIT_VALENCES)
    + len(HYBRIDIZATIONS) + 1 + len(TOTAL_HS)
)  # = 35
NUM_RAW_FEATURES = 5


def one_of_k_encoding_unk(x, valid_entries: Sequence) -> List[int]:
    """One-hot with out-of-vocabulary mapped to ``'Unknown'``.

    Matches reference ``train.py:19-22`` exactly — note that when
    ``'Unknown'`` is *not* in ``valid_entries`` (the degree / valence /
    hybridization / H-count fields), an out-of-vocabulary value yields an
    **all-zero** vector, which we reproduce deliberately.
    """
    if x not in valid_entries:
        x = "Unknown"
    return [1 if entry == x else 0 for entry in valid_entries]


def atom_features_35(mol: Mol) -> np.ndarray:
    """[N, 35] float32 feature matrix (reference ``train.py:33-44``)."""
    feats = np.zeros((mol.GetNumAtoms(), NUM_ATOM_FEATURES), dtype=np.float32)
    for i, atom in enumerate(mol.GetAtoms()):
        row = (
            one_of_k_encoding_unk(atom.GetSymbol(), ATOM_SYMBOLS)
            + one_of_k_encoding_unk(atom.GetDegree(), DEGREES)
            + one_of_k_encoding_unk(atom.GetImplicitValence(), IMPLICIT_VALENCES)
            + one_of_k_encoding_unk(atom.GetHybridization(), HYBRIDIZATIONS)
            + [1 if atom.GetIsAromatic() else 0]
            + one_of_k_encoding_unk(atom.GetTotalNumHs(), TOTAL_HS)
        )
        feats[i] = row
    return feats


def atom_features_5(mol: Mol) -> np.ndarray:
    """[N, 5] raw features used by the GCN baseline (``gnn/gcn.py:21-29``):
    atomic number, degree, implicit valence, formal charge, aromatic flag."""
    feats = np.zeros((mol.GetNumAtoms(), NUM_RAW_FEATURES), dtype=np.float32)
    for i, atom in enumerate(mol.GetAtoms()):
        feats[i] = (
            atom.GetAtomicNum(),
            atom.GetDegree(),
            atom.GetImplicitValence(),
            atom.GetFormalCharge(),
            1.0 if atom.GetIsAromatic() else 0.0,
        )
    return feats


def mol_to_graph(mol: Mol, featurizer: str = "35") -> Tuple[np.ndarray, np.ndarray]:
    """(atom_features [N, F], edge_index [2, 2E]) — COO with both directions.

    Edge ordering matches the reference's ``adj.nonzero().t()`` construction
    (reference ``train.py:46-55``): row-major over the dense adjacency, i.e.
    sorted by (src, dst).
    """
    feats = atom_features_35(mol) if featurizer == "35" else atom_features_5(mol)
    n = mol.GetNumAtoms()
    pairs = set()
    for b in mol.GetBonds():
        pairs.add((b.a1, b.a2))
        pairs.add((b.a2, b.a1))
    if pairs:
        edge_index = np.array(sorted(pairs), dtype=np.int32).T
    else:
        edge_index = np.zeros((2, 0), dtype=np.int32)
    assert edge_index.shape[1] <= n * n
    return feats, edge_index


def smiles_to_graph(smiles: str, featurizer: str = "35") -> Tuple[np.ndarray, np.ndarray]:
    """Parse + featurize; raises ``ValueError`` on bad SMILES
    (mirrors reference ``train.py:25-28`` skip semantics)."""
    mol = parse_smiles(smiles)  # raises SmilesParseError (a ValueError)
    return mol_to_graph(mol, featurizer=featurizer)


def smiles_to_padded_graph(
    smiles: str,
    max_nodes: int,
    max_edges: int,
    featurizer: str = "35",
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Fixed-shape graph: (nodes [N_max,F], edges [2,E_max], node_mask, edge_mask).

    Padded edge slots point at node ``0`` but are masked; padded node rows are
    zero.  Returns ``None`` if the molecule exceeds the budget (caller decides
    whether to re-bucket or skip).
    """
    feats, edge_index = smiles_to_graph(smiles, featurizer=featurizer)
    n, e = feats.shape[0], edge_index.shape[1]
    if n > max_nodes or e > max_edges:
        return None
    fdim = feats.shape[1]
    nodes = np.zeros((max_nodes, fdim), dtype=np.float32)
    nodes[:n] = feats
    edges = np.zeros((2, max_edges), dtype=np.int32)
    edges[:, :e] = edge_index
    node_mask = np.zeros((max_nodes,), dtype=np.float32)
    node_mask[:n] = 1.0
    edge_mask = np.zeros((max_edges,), dtype=np.float32)
    edge_mask[:e] = 1.0
    return nodes, edges, node_mask, edge_mask
