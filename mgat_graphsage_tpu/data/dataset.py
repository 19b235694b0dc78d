"""CSV -> fixed-shape padded TPU batches.

Replaces the reference's per-script pandas + PyG ``DataLoader`` pipeline
(reference ``train.py:163-210``): read a ``Smiles,pchembl`` CSV, standardize
targets with a train-fit scaler (``train.py:173-181``), featurize each
molecule, and batch.

TPU-first design: PyG concatenates variable-size graphs dynamically, which
would force an XLA recompile per batch shape.  Here every molecule is padded
to a per-dataset ``(max_nodes, max_edges)`` budget so batches have ONE static
shape: ``nodes [B, N, F]``, ``edges [B, 2, E]``, ``node_mask [B, N]``,
``edge_mask [B, E]``, ``fp [B, nbits]``, ``y/y_orig [B]``, ``sample_mask``
(0 rows pad the final partial batch to full size).  Dense per-molecule
adjacency for the MXU message-passing path is built on device from the edge
lists (see ``ops/graph.py``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..chem import smiles_to_graph
from ..chem.fingerprints import FINGERPRINTS

__all__ = [
    "StandardScaler",
    "GraphBatch",
    "MolecularDataset",
    "load_csv",
    "pad_to_multiple",
]


class StandardScaler:
    """Mean/std target scaler (sklearn-semantics: ddof=0), two floats.

    The reference pickles an sklearn ``StandardScaler`` into its checkpoint
    (``train.py:173-181,294``); we store the two floats as arrays so the
    scaler rides inside JAX checkpoints and jitted de-normalization.
    """

    def __init__(self, mean: float = 0.0, scale: float = 1.0):
        self.mean_ = float(mean)
        self.scale_ = float(scale)

    def fit(self, y: np.ndarray) -> "StandardScaler":
        y = np.asarray(y, dtype=np.float64).reshape(-1)
        self.mean_ = float(y.mean())
        std = float(y.std())
        self.scale_ = std if std > 0 else 1.0
        return self

    def fit_transform(self, y: np.ndarray) -> np.ndarray:
        return self.fit(y).transform(y)

    def transform(self, y):
        return (np.asarray(y, dtype=np.float32) - self.mean_) / self.scale_

    def inverse_transform(self, y):
        return np.asarray(y, dtype=np.float32) * self.scale_ + self.mean_

    def to_dict(self) -> Dict[str, float]:
        return {"mean": self.mean_, "scale": self.scale_}

    @classmethod
    def from_dict(cls, d) -> "StandardScaler":
        return cls(d["mean"], d["scale"])


@dataclasses.dataclass
class GraphBatch:
    """One fixed-shape batch. All arrays are numpy on host; the trainer
    moves them to device."""

    nodes: np.ndarray        # [B, N, F] float32
    edges: np.ndarray        # [B, 2, E] int32 (COO, both directions)
    node_mask: np.ndarray    # [B, N] float32
    edge_mask: np.ndarray    # [B, E] float32
    fp: np.ndarray           # [B, nbits] float32 (zeros if no fingerprint)
    y: np.ndarray            # [B] float32 (normalized target)
    y_orig: np.ndarray       # [B] float32 (original-scale target)
    sample_mask: np.ndarray  # [B] float32 (0 = padding row)

    def as_dict(self) -> Dict[str, np.ndarray]:
        return dataclasses.asdict(self)

    @property
    def batch_size(self) -> int:
        return self.nodes.shape[0]


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def load_csv(path: str, smiles_column: str = "Smiles",
             target_column: str = "pchembl") -> Tuple[List[str], np.ndarray]:
    """CSV reader for the reference ``Smiles,pchembl`` schema
    (``train.py:163-168``); no pandas needed on the hot path.

    Uses stdlib ``csv``, so RFC-4180 quoting in real ChEMBL exports —
    quoted fields containing commas, embedded quotes, even newlines —
    parses correctly (tests/test_data.py::test_load_csv_quoted_fields).
    Extra columns are ignored; column order is free."""
    import csv
    import os

    if not os.path.exists(path):
        # installed-package mode: the bundled split paths point into
        # ~/.cache and materialize deterministically on first use
        from . import (FULL_CSV, TEST_CSV, TRAIN_CSV, VAL_CSV,
                       ensure_bundled_datasets)

        if path in (TRAIN_CSV, VAL_CSV, TEST_CSV, FULL_CSV):
            ensure_bundled_datasets()

    smiles, targets = [], []
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        for row in reader:
            smiles.append(row[smiles_column])
            targets.append(float(row[target_column]))
    return smiles, np.asarray(targets, dtype=np.float32)


class MolecularDataset:
    """Featurized, padded, batchable dataset.

    Invalid SMILES are skipped with a log line, matching the reference's
    try/except-print semantics (``train.py:184-194``).
    """

    def __init__(
        self,
        smiles: List[str],
        targets: np.ndarray,
        scaler: Optional[StandardScaler] = None,
        fit_scaler: bool = False,
        fingerprint: Optional[str] = "ecfp1024",
        featurizer: str = "35",
        max_nodes: Optional[int] = None,
        max_edges: Optional[int] = None,
        node_multiple: int = 8,
        verbose: bool = True,
        use_native: bool = True,
    ):
        targets = np.asarray(targets, dtype=np.float32).reshape(-1)
        graphs = fps = kept_targets = kept_smiles = kept_indices = None
        if use_native:
            native = self._featurize_native(
                smiles, targets, fingerprint, featurizer, verbose)
            if native is not None:
                graphs, fps, kept_targets, kept_smiles, kept_indices = native
        if graphs is None:
            graphs, fps, kept_targets, kept_smiles = [], [], [], []
            kept_indices = []
            fp_fn = FINGERPRINTS[fingerprint] if fingerprint else None
            for i, (smi, y) in enumerate(zip(smiles, targets)):
                try:
                    feats, edge_index = smiles_to_graph(
                        str(smi), featurizer=featurizer)
                    fp = fp_fn(str(smi))[0] if fp_fn else None
                except ValueError as e:
                    if verbose:
                        print(e)
                    continue
                graphs.append((feats, edge_index))
                fps.append(fp)
                kept_targets.append(y)
                kept_smiles.append(str(smi))
                kept_indices.append(i)

        if not graphs:
            raise ValueError("No valid molecules in dataset")

        # drop molecules over an explicit (max_nodes, max_edges) budget
        # BEFORE allocating arrays, so indices stay consistent
        if max_nodes is not None or max_edges is not None:
            budget_n = max_nodes or 10 ** 9
            budget_e = max_edges or 10 ** 9
            keep = [i for i, (g, e) in enumerate(graphs)
                    if g.shape[0] <= budget_n and e.shape[1] <= budget_e]
            if len(keep) < len(graphs):
                if verbose:
                    print(f"[data] dropped {len(graphs) - len(keep)} "
                          f"molecules over the ({budget_n},{budget_e}) "
                          f"budget")
                graphs = [graphs[i] for i in keep]
                fps = [fps[i] for i in keep]
                kept_targets = [kept_targets[i] for i in keep]
                kept_smiles = [kept_smiles[i] for i in keep]
                kept_indices = [kept_indices[i] for i in keep]
            if not graphs:
                raise ValueError("No molecules fit the shape budget")

        self.smiles = kept_smiles
        # original input-row index of every kept molecule (invalid SMILES /
        # over-budget rows are skipped), so callers can re-align outputs
        self.kept_indices = np.asarray(kept_indices, dtype=np.int64)
        self.y_orig = np.asarray(kept_targets, dtype=np.float32)
        if scaler is None:
            scaler = StandardScaler()
            if fit_scaler:
                scaler.fit(self.y_orig)
        elif fit_scaler:
            scaler.fit(self.y_orig)
        self.scaler = scaler
        self.y = scaler.transform(self.y_orig).astype(np.float32)

        obs_nodes = max(g[0].shape[0] for g in graphs)
        obs_edges = max(g[1].shape[1] for g in graphs)
        self.max_nodes = max_nodes or pad_to_multiple(obs_nodes, node_multiple)
        self.max_edges = max_edges or pad_to_multiple(max(obs_edges, 1), 16)
        self.feature_dim = graphs[0][0].shape[1]
        self.fp_dim = len(fps[0]) if fps[0] is not None else 0
        self.fingerprint = fingerprint

        n = len(graphs)
        self.nodes = np.zeros((n, self.max_nodes, self.feature_dim), np.float32)
        self.edges = np.zeros((n, 2, self.max_edges), np.int32)
        self.node_mask = np.zeros((n, self.max_nodes), np.float32)
        self.edge_mask = np.zeros((n, self.max_edges), np.float32)
        self.fp = np.zeros((n, max(self.fp_dim, 1)), np.float32)
        for i, (feats, edge_index) in enumerate(graphs):
            nn, ne = feats.shape[0], edge_index.shape[1]
            self.nodes[i, :nn] = feats
            self.edges[i, :, :ne] = edge_index
            self.node_mask[i, :nn] = 1.0
            self.edge_mask[i, :ne] = 1.0
            if fps[i] is not None:
                self.fp[i] = fps[i]
        self.n = n

    @staticmethod
    def _featurize_native(smiles, targets, fingerprint, featurizer,
                          verbose):
        """Fast path: batch-featurize with the C++ library (bit-identical
        to the Python path; see csrc/featurizer.cpp).  Returns the same
        (graphs, fps, targets, smiles) lists the Python loop builds, or
        None when the native path doesn't cover this configuration."""
        native_fps = {None: (0, False), "ecfp1024": (1024, False),
                      "ecfp2048": (2048, False), "morgan1024": (1024, False),
                      "morgan2048": (2048, False), "fcfp1024": (1024, True)}
        if fingerprint not in native_fps or featurizer not in ("35", "5"):
            return None
        try:
            from ..chem.native import featurize_batch_native
        except Exception:
            return None
        fp_bits, use_features = native_fps[fingerprint]
        res = featurize_batch_native(
            [str(s) for s in smiles], 35 if featurizer == "35" else 5,
            max_nodes=128, max_edges=288, fp_bits=fp_bits,
            use_features=use_features)
        if res is None:
            return None
        nodes, edges, node_mask, edge_mask, fp, status = res
        graphs, fps, kept_targets, kept_smiles = [], [], [], []
        kept_indices = []
        for i, smi in enumerate(smiles):
            if status[i] <= 0:
                if verbose:
                    print(f"Invalid SMILES string: {smi!r}"
                          if status[i] == -1 else
                          f"[data] molecule exceeds native budget: {smi!r}")
                continue
            na = int(status[i])
            ne = int(edge_mask[i].sum())
            graphs.append((nodes[i, :na].copy(),
                           edges[i, :, :ne].copy()))
            fps.append(fp[i].copy() if fp is not None else None)
            kept_targets.append(targets[i])
            kept_smiles.append(str(smi))
            kept_indices.append(i)
        return graphs, fps, kept_targets, kept_smiles, kept_indices

    def __len__(self) -> int:
        return self.n

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0, drop_last: bool = False,
                pad_final: bool = True) -> Iterator[GraphBatch]:
        """Yield fixed-shape batches; the final partial batch is padded to
        ``batch_size`` with ``sample_mask`` zeros (so jit sees one shape)."""
        idx = np.arange(self.n)
        if shuffle:
            idx = np.random.default_rng(seed).permutation(self.n)
        for start in range(0, self.n, batch_size):
            sel = idx[start:start + batch_size]
            if len(sel) < batch_size:
                if drop_last:
                    return
                if pad_final:
                    pad = np.zeros(batch_size - len(sel), dtype=sel.dtype)
                    mask = np.concatenate([
                        np.ones(len(sel), np.float32),
                        np.zeros(batch_size - len(sel), np.float32)])
                    sel = np.concatenate([sel, pad])
                else:
                    mask = np.ones(len(sel), np.float32)
            else:
                mask = np.ones(batch_size, np.float32)
            yield GraphBatch(
                nodes=self.nodes[sel],
                edges=self.edges[sel],
                node_mask=self.node_mask[sel],
                edge_mask=self.edge_mask[sel],
                fp=self.fp[sel],
                y=self.y[sel],
                y_orig=self.y_orig[sel],
                sample_mask=mask,
            )

    def num_batches(self, batch_size: int, drop_last: bool = False) -> int:
        if drop_last:
            return self.n // batch_size
        return (self.n + batch_size - 1) // batch_size

    # ---- multi-bucket batching (docs/DESIGN.md; VERDICT r2 next #7) ----
    def bucket_plan(self, buckets: Tuple[int, ...] = (32, 48, 64, 96)
                    ) -> List[Tuple[int, int, np.ndarray]]:
        """Route each molecule to the smallest node bucket it fits.

        Returns ``[(bucket_nodes, bucket_edges, indices), ...]`` for the
        non-empty buckets, in ascending bucket order.  ``bucket_nodes``
        is capped at ``self.max_nodes``; molecules over the largest
        bucket land in a final ``self.max_nodes`` bucket.  Each bucket's
        edge budget is the member maximum padded to a multiple of 16
        (static per dataset, so XLA compiles once per bucket).
        """
        n_atoms = self.node_mask.sum(axis=1).astype(np.int64)
        n_edges = self.edge_mask.sum(axis=1).astype(np.int64)
        bounds = sorted({min(b, self.max_nodes) for b in buckets
                         if b > 0})
        if not bounds or bounds[-1] < self.max_nodes:
            bounds.append(self.max_nodes)
        plan: List[Tuple[int, int, np.ndarray]] = []
        assigned = np.full(self.n, -1, dtype=np.int64)
        for bi, bn in enumerate(bounds):
            mask = (assigned < 0) & (n_atoms <= bn)
            idx = np.nonzero(mask)[0]
            if idx.size == 0:
                continue
            assigned[idx] = bi
            be = pad_to_multiple(max(int(n_edges[idx].max()), 1), 16)
            be = min(be, self.max_edges)
            plan.append((bn, be, idx))
        return plan

    def bucket_view(self, bucket_nodes: int, bucket_edges: int,
                    idx: np.ndarray) -> "MolecularDataset":
        """A dataset restricted to ``idx`` and trimmed to a bucket's
        ``(bucket_nodes, bucket_edges)`` budget — pure array slicing of
        the already-featurized arrays (no re-parse/re-featurize), so a
        per-bucket training or serving program costs only its compile.
        Valid edge indices are < n_atoms <= bucket_nodes by
        ``bucket_plan`` construction; trimmed tails are padding only.
        """
        idx = np.asarray(idx, dtype=np.int64)
        ds = object.__new__(MolecularDataset)
        ds.smiles = [self.smiles[i] for i in idx]
        ds.kept_indices = self.kept_indices[idx]
        ds.y_orig = self.y_orig[idx]
        ds.scaler = self.scaler
        ds.y = self.y[idx]
        ds.max_nodes = int(bucket_nodes)
        ds.max_edges = int(bucket_edges)
        ds.feature_dim = self.feature_dim
        ds.fp_dim = self.fp_dim
        ds.fingerprint = self.fingerprint
        # ascontiguousarray: the sliced view would otherwise pin the
        # full-width fancy-index copy in memory and force a re-copy at
        # device upload
        ds.nodes = np.ascontiguousarray(self.nodes[idx][:, :bucket_nodes])
        ds.edges = np.ascontiguousarray(
            self.edges[idx][:, :, :bucket_edges])
        ds.node_mask = np.ascontiguousarray(
            self.node_mask[idx][:, :bucket_nodes])
        ds.edge_mask = np.ascontiguousarray(
            self.edge_mask[idx][:, :bucket_edges])
        ds.fp = self.fp[idx]
        ds.n = int(idx.size)
        return ds

    def bucketed_batches(self, batch_size: int,
                         buckets: Tuple[int, ...] = (32, 48, 64, 96),
                         shuffle: bool = False, seed: int = 0,
                         pad_final: bool = True
                         ) -> Iterator["GraphBatch"]:
        """Yield fixed-shape batches per node bucket: array slices are
        trimmed to the bucket's (nodes, edges) budget, so small molecules
        stop paying the global worst-case padding.  Shuffling permutes
        WITHIN each bucket (batch composition is bucket-pure by design —
        that is what makes the shapes static)."""
        rng = np.random.default_rng(seed)
        for bn, be, idx in self.bucket_plan(buckets):
            if shuffle:
                idx = rng.permutation(idx)
            for start in range(0, idx.size, batch_size):
                sel = idx[start:start + batch_size]
                k = sel.size
                if k < batch_size:
                    if not pad_final:
                        mask = np.ones(k, np.float32)
                    else:
                        pad = np.full(batch_size - k, sel[0],
                                      dtype=sel.dtype)
                        mask = np.concatenate([
                            np.ones(k, np.float32),
                            np.zeros(batch_size - k, np.float32)])
                        sel = np.concatenate([sel, pad])
                else:
                    mask = np.ones(batch_size, np.float32)
                yield GraphBatch(
                    nodes=self.nodes[sel, :bn],
                    # valid edge indices are < n_atoms <= bn by bucket
                    # construction; padding entries are 0
                    edges=self.edges[sel, :, :be],
                    node_mask=self.node_mask[sel, :bn],
                    edge_mask=self.edge_mask[sel, :be],
                    fp=self.fp[sel],
                    y=self.y[sel],
                    y_orig=self.y_orig[sel],
                    sample_mask=mask,
                )


def write_csv(path: str, smiles: List[str], targets) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("Smiles,pchembl\n")
        for s, y in zip(smiles, targets):
            f.write(f"{s},{y:.4f}\n")
