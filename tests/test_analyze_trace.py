"""scripts/analyze_trace.py accounting-logic test on a synthetic trace.

The flattener's rules were validated against real chip traces
(profiles/); this pins them: leaf ops come ONLY from the 'XLA Ops'
line, control-flow wrappers (while/jit) are excluded, the envelope
comes from 'XLA Modules', async DMA is reported separately (never
added), and bubbles = envelope - leaves.
"""

import json
import os
import subprocess
import sys

import pytest

tf_proto = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2",
    reason="TF xplane protobuf schema unavailable")

REPO = os.path.join(os.path.dirname(__file__), "..")


def _make_trace(tmp_path):
    space = tf_proto.XSpace()
    plane = space.planes.add()
    plane.name = "/device:TPU:0"

    def meta(eid, name):
        m = plane.event_metadata[eid]
        m.id = eid
        m.name = name
        return m

    meta(1, "fusion.1")
    meta(2, "while.8")
    meta(3, "copy.1")
    meta(4, "jit_prog(123)")
    meta(5, "async-copy")

    def add_event(line, eid, dur_ps):
        ev = line.events.add()
        ev.metadata_id = eid
        ev.duration_ps = dur_ps

    modules = plane.lines.add()
    modules.name = "XLA Modules"
    add_event(modules, 4, 1_000_000_000)      # 1 ms envelope (10 steps)

    ops = plane.lines.add()
    ops.name = "XLA Ops"
    add_event(ops, 2, 990_000_000)            # wrapper: excluded
    add_event(ops, 1, 600_000_000)            # fusion leaf
    add_event(ops, 3, 300_000_000)            # copy leaf

    dma = plane.lines.add()
    dma.name = "Async XLA Ops"
    add_event(dma, 5, 5_000_000_000)          # overlapped DMA

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with open(d / "vm.xplane.pb", "wb") as f:
        f.write(space.SerializeToString())
    return str(tmp_path)


def test_accounting_rules(tmp_path):
    trace_dir = _make_trace(tmp_path)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "analyze_trace.py"),
         trace_dir, "--steps", "10"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    out = json.load(open(os.path.join(trace_dir, "OPS.json")))
    # envelope 1 ms / 10 steps = 100 us/step
    assert out["envelope_us_per_step"] == pytest.approx(100.0)
    # leaves = fusion 60 + copy 30 (wrapper excluded)
    assert out["leaf_ops_us_per_step"] == pytest.approx(90.0)
    assert out["bubble_us_per_step"] == pytest.approx(10.0)
    # DMA reported separately, never added to leaves
    assert out["async_dma_us_per_step_overlapped"] == pytest.approx(500.0)
    names = [o["op"] for o in out["top_ops"]]
    assert "fusion.1" in names and "copy.1" in names
    assert "while.8" not in names and "jit_prog(123)" not in names
    cats = {c["category"]: c["us_per_step"] for c in out["categories"]}
    assert cats["elementwise fusion"] == pytest.approx(60.0)
    assert cats["copy/convert/transpose"] == pytest.approx(30.0)
