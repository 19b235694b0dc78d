"""ctypes bindings for the native C++ featurizer (csrc/featurizer.cpp).

The featurization loop is the framework's host-side hot path (the
reference re-parses every SMILES with RDKit per script run); the C++
implementation is ~100x the pure-Python throughput and produces
bit-identical outputs (enforced by tests/test_native.py).

The shared library is built on first use with g++ (-O3) and cached next
to the source; set ``MGAT_NO_NATIVE=1`` to force the Python path.
Loading is lazy and failure-tolerant: any build/load problem silently
falls back to Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["native_available", "featurize_batch_native", "get_lib"]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc")
_SRC = os.path.join(_CSRC, "featurizer.cpp")
_LIB = os.path.join(_CSRC, "libmgatchem.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
            return True
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _LIB]
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=300)
        if res.returncode != 0:
            print(f"[native] build failed:\n{res.stderr[:2000]}")
            return False
        return True
    except Exception as e:
        print(f"[native] build error: {e}")
        return False


def get_lib():
    """The loaded shared library, or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("MGAT_NO_NATIVE"):
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            print(f"[native] load error: {e}")
            return None
        lib.mgat_featurize_batch.restype = ctypes.c_int
        lib.mgat_featurize_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def featurize_batch_native(
    smiles_list: List[str],
    feat_dim: int,
    max_nodes: int,
    max_edges: int,
    fp_bits: int = 0,
    fp_radius: int = 2,
    use_features: bool = False,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                    Optional[np.ndarray], np.ndarray]]:
    """Featurize a batch of SMILES with the native library.

    Returns (nodes [n, max_nodes, feat_dim], edges [n, 2, max_edges],
    node_mask, edge_mask, fp [n, fp_bits] or None, status [n]) where
    status[i] = atom count, or <0 for parse / budget errors.  Returns
    None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(smiles_list)
    blob = b"\x00".join(s.encode("utf-8") for s in smiles_list) + b"\x00"
    offsets = np.zeros(n, np.int32)
    pos = 0
    for i, s in enumerate(smiles_list):
        offsets[i] = pos
        pos += len(s.encode("utf-8")) + 1

    nodes = np.zeros((n, max_nodes, feat_dim), np.float32)
    edges = np.zeros((n, 2, max_edges), np.int32)
    n_edges = np.zeros(n, np.int32)
    fp = np.zeros((n, fp_bits), np.float32) if fp_bits else None
    status = np.zeros(n, np.int32)

    lib.mgat_featurize_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, feat_dim, max_nodes, max_edges,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fp.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if fp is not None else None,
        fp_bits, fp_radius, 1 if use_features else 0,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )

    node_mask = np.zeros((n, max_nodes), np.float32)
    edge_mask = np.zeros((n, max_edges), np.float32)
    for i in range(n):
        if status[i] > 0:
            node_mask[i, :status[i]] = 1.0
            edge_mask[i, :n_edges[i]] = 1.0
    return nodes, edges, node_mask, edge_mask, fp, status
