"""Compact device-resident dataset storage for HBM-scale training.

The epoch-scan trainer (``train/trainer.py``) keeps the WHOLE featurized
dataset resident in HBM so each epoch is one dispatch.  In the plain
float32 layout that costs ~15.8 GB per 10^6 molecules at the bundled
shape budget (nodes ``[n, 72, 35]`` f32 alone is 10.1 GB) — over a
single v5e's 16 GB.  This module packs the dataset into the smallest
exact representation and unpacks per batch *inside* the scan:

====================  =========================  =====================
stream                plain                      compact
====================  =========================  =====================
nodes                 ``[n, N, F]`` float32      ``[n, N, F]`` int8
edges                 ``[n, 2, E]`` int32        ``[n, 2, E]`` uint8*
node_mask             ``[n, N]`` float32         ``n_atoms [n]`` int32
edge_mask             ``[n, E]`` float32         ``n_edges [n]`` int32
fp (binary)           ``[n, nbits]`` float32     ``[n, nbits/8]`` uint8
y / y_orig            ``[n]`` float32            (unchanged)
====================  =========================  =====================

(*) uint8 when ``max_nodes <= 256``, else uint16.

~5.4x smaller at the flagship shape (measured 3.07 GB per 10^6
molecules device-resident, BENCH_SCALE_1M.json; 2.97 GB by the static
stream-size estimate), and
**bit-exact**: every packed stream is integral (the 35-dim featurizer is
one-hot/flags, the 5-dim raw featurizer is small ints, reference
``train.py:33-44`` / ``gnn/gcn.py:21-29``; masks are leading-ones by
construction — ``data/dataset.py``), so the int->float casts reproduce
the plain arrays exactly and training trajectories are identical
(``tests/test_packed.py``).  Per-batch unpack cost is VPU-trivial next
to the weight-bound step, and the batch *gather* moves ~5x fewer bytes.

Non-binary fingerprints (BCI's descriptor block, SMIFP counts) fall back
to float32 passthrough for the ``fp`` stream only; everything else still
packs.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["pack_dataset", "gather_batch", "packed_nbytes", "plain_nbytes"]


def _check_integral(a: np.ndarray, lo: int, hi: int, what: str) -> None:
    if not np.all(a == np.round(a)):
        raise ValueError(f"{what} has non-integral values; cannot pack")
    if a.min() < lo or a.max() > hi:
        raise ValueError(
            f"{what} values outside [{lo}, {hi}]; cannot pack")


def pack_dataset(ds) -> Dict[str, np.ndarray]:
    """``MolecularDataset`` -> compact host dict (see module docstring).

    Raises ``ValueError`` if the node features are not small integers
    (both bundled featurizers are).  A non-binary fingerprint stream
    stays float32 under the plain ``"fp"`` key.
    """
    _check_integral(ds.nodes, -128, 127, "node features")
    packed: Dict[str, np.ndarray] = {
        "nodes_i8": ds.nodes.astype(np.int8),
        "y": np.asarray(ds.y, np.float32),
        "y_orig": np.asarray(ds.y_orig, np.float32),
        # leading-ones masks (dataset.py fills [:n_valid]) reduce to counts
        "n_atoms": ds.node_mask.sum(axis=1).astype(np.int32),
        "n_edges": ds.edge_mask.sum(axis=1).astype(np.int32),
    }
    # The count->mask reconstruction in gather_batch assumes leading-ones
    # masks. dataset.py builds them that way, but verify rather than
    # trust the caller — a scattered mask would otherwise train on
    # silently wrong masking.
    for mask, counts, what in ((ds.node_mask, packed["n_atoms"], "node"),
                               (ds.edge_mask, packed["n_edges"], "edge")):
        rebuilt = (np.arange(mask.shape[1])[None, :]
                   < counts[:, None]).astype(mask.dtype)
        if not np.array_equal(np.asarray(mask), rebuilt):
            raise ValueError(
                f"{what}_mask is not leading-ones; cannot pack to counts")
    edge_dtype = np.uint8 if ds.max_nodes <= 256 else np.uint16
    if ds.edges.min() < 0 or ds.edges.max() >= max(ds.max_nodes, 1):
        raise ValueError("edge indices outside [0, max_nodes)")
    packed["edges_p"] = ds.edges.astype(edge_dtype)

    fp = np.asarray(ds.fp, np.float32)
    if fp.size and np.all((fp == 0.0) | (fp == 1.0)):
        # little-endian bit order: bit j of byte k is fp[:, 8*k + j]
        packed["fp_packed"] = np.packbits(
            fp.astype(np.uint8), axis=1, bitorder="little")
    else:
        packed["fp"] = fp
    return packed


def is_packed(data: Dict) -> bool:
    return "nodes_i8" in data


def gather_batch(data: Dict, idx, fp_dim: int) -> Dict:
    """Gather batch ``idx`` from a device dataset dict — plain or packed.

    For a packed dict this reconstructs the exact plain-layout batch
    (float32 nodes/masks/fp, int32 edges) on device; dict keys are
    static under ``jit``, so the branch costs nothing at runtime.
    ``fp_dim`` is the true fingerprint width (static), needed because
    bit-packing rounds the byte axis up.
    """
    import jax.numpy as jnp

    if not is_packed(data):
        batch = {k: v[idx] for k, v in data.items()
                 if k not in ("y", "y_orig")}
        batch["y"] = data["y"][idx]
        batch["y_orig"] = data["y_orig"][idx]
        return batch

    nodes = data["nodes_i8"][idx].astype(jnp.float32)
    edges = data["edges_p"][idx].astype(jnp.int32)
    n, e = nodes.shape[1], edges.shape[2]
    node_mask = (jnp.arange(n, dtype=jnp.int32)[None, :]
                 < data["n_atoms"][idx][:, None]).astype(jnp.float32)
    edge_mask = (jnp.arange(e, dtype=jnp.int32)[None, :]
                 < data["n_edges"][idx][:, None]).astype(jnp.float32)
    if "fp_packed" in data:
        packed = data["fp_packed"][idx]  # [B, nbytes] uint8
        bits = (packed[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        fp = bits.reshape(packed.shape[0], -1)[:, :fp_dim] \
            .astype(jnp.float32)
    else:
        fp = data["fp"][idx]
    return {"nodes": nodes, "edges": edges, "node_mask": node_mask,
            "edge_mask": edge_mask, "fp": fp,
            "y": data["y"][idx], "y_orig": data["y_orig"][idx]}


def _nbytes(d: Dict[str, np.ndarray]) -> int:
    return int(sum(int(np.asarray(v).nbytes) for v in d.values()))


def packed_nbytes(ds) -> int:
    """Device bytes of the compact layout for ``ds``."""
    return _nbytes(pack_dataset(ds))


def plain_nbytes(ds) -> int:
    """Device bytes of the plain float32 layout for ``ds``."""
    return _nbytes({"nodes": ds.nodes, "edges": ds.edges,
                    "node_mask": ds.node_mask, "edge_mask": ds.edge_mask,
                    "fp": ds.fp, "y": ds.y, "y_orig": ds.y_orig})
