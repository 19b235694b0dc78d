"""Flatten a jax.profiler xplane trace into a per-op accounting table.

VERDICT r2 next #4 asks that the remaining gap between the measured
train step and the HBM roofline be *accounted for*, op by op, from a
committed trace.  ``scripts/profile_step.py`` captures the trace; this
script parses the ``.xplane.pb`` (via the protobuf schema TF ships —
no TensorBoard UI needed on this image) and writes
``profiles/<config>/OPS.json``.

XPlane structure on the TPU device plane (validated against the
chrome-trace export of the same run):

  - line "XLA Modules": one event per program dispatch -> the step
    ENVELOPE (device-busy time);
  - line "XLA Ops": every compiled op, PLUS control-flow wrapper events
    (``while.N``, sometimes the jit entry) that span their children and
    must be excluded from the leaf sum;
  - line "Async XLA Ops": DMA/async-copy events that OVERLAP compute —
    reported separately, never added to the leaf total.

``envelope - leaf_sum`` is then genuine scheduling bubble time.

Usage: python scripts/analyze_trace.py profiles/bf16_full --steps 50
"""

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

_WRAPPER = re.compile(r"^(while|jit_|body|condition|cond_)")

_CATEGORIES = (
    ("convolution/matmul", re.compile(
        r"convolution|dot|conv\d|%dot|matmul", re.I)),
    ("scatter (adjacency)", re.compile(r"scatter", re.I)),
    ("rng", re.compile(r"rng|threefry|random", re.I)),
    ("copy/convert/transpose", re.compile(
        r"^copy|convert|transpose|bitcast|reshape", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("elementwise fusion", re.compile(r"fusion|fused", re.I)),
)


def categorize(name: str) -> str:
    for cat, pat in _CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space, paths[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=50,
                    help="steps the traced program ran (divisor)")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    space, path = load_xspace(args.trace_dir)
    planes = [p for p in space.planes
              if "TPU" in p.name and p.lines] or \
             [p for p in space.planes if p.lines]
    plane = max(planes, key=lambda p: sum(len(l.events) for l in p.lines))

    lines = {l.name: l for l in plane.lines}
    ev_meta = plane.event_metadata

    def total_ps(line):
        return sum(e.duration_ps for e in line.events) if line else 0

    envelope_ps = total_ps(lines.get("XLA Modules") or lines.get("Steps"))
    async_ps = total_ps(lines.get("Async XLA Ops"))

    per_op_ps = defaultdict(int)
    per_op_n = defaultdict(int)
    ops_line = lines.get("XLA Ops")
    if ops_line is None:
        raise SystemExit(f"no 'XLA Ops' line on plane '{plane.name}'")
    for ev in ops_line.events:
        meta = ev_meta.get(ev.metadata_id)
        name = (meta.display_name or meta.name) if meta else "?"
        if _WRAPPER.match(name):
            continue
        per_op_ps[name] += ev.duration_ps
        per_op_n[name] += 1

    leaf_ps = sum(per_op_ps.values())
    rows = sorted(per_op_ps.items(), key=lambda kv: -kv[1])
    cat_ps = defaultdict(int)
    for name, ps in rows:
        cat_ps[categorize(name)] += ps

    def us_step(ps):
        return round(ps / 1e6 / args.steps, 2)

    out = {
        "trace": os.path.relpath(path),
        "plane": plane.name,
        "steps": args.steps,
        "envelope_us_per_step": us_step(envelope_ps),
        "leaf_ops_us_per_step": us_step(leaf_ps),
        "bubble_us_per_step": us_step(max(envelope_ps - leaf_ps, 0)),
        "async_dma_us_per_step_overlapped": us_step(async_ps),
        "categories": [
            {"category": c, "us_per_step": us_step(ps),
             "pct_of_leaves": round(100 * ps / max(leaf_ps, 1), 1)}
            for c, ps in sorted(cat_ps.items(), key=lambda kv: -kv[1])],
        "top_ops": [
            {"op": n, "us_per_step": us_step(ps),
             "pct_of_leaves": round(100 * ps / max(leaf_ps, 1), 1),
             "calls_per_step": round(per_op_n[n] / args.steps, 1)}
            for n, ps in rows[:args.top]],
    }
    out_path = os.path.join(args.trace_dir, "OPS.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[analyze_trace] {plane.name}: envelope "
          f"{out['envelope_us_per_step']} us/step = "
          f"{out['leaf_ops_us_per_step']} leaf ops + "
          f"{out['bubble_us_per_step']} bubbles "
          f"({out['async_dma_us_per_step_overlapped']} us of DMA "
          f"overlapped)", file=sys.stderr)
    for c in out["categories"]:
        print(f"  {c['category']:<26} {c['us_per_step']:>8} us/step "
              f"({c['pct_of_leaves']}% of leaves)", file=sys.stderr)
    print(out_path)


if __name__ == "__main__":
    main()
