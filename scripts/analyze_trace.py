"""Flatten a jax.profiler xplane trace into a per-op accounting table.

VERDICT r2 next #4 asks that the remaining gap between the measured
train step and the HBM roofline be *accounted for*, op by op, from a
committed trace.  ``scripts/profile_step.py`` captures the trace; this
script parses the ``.xplane.pb`` (via the protobuf schema TF ships —
no TensorBoard UI needed on this image) and writes
``profiles/<config>/OPS.json``:

  - every XLA op/fusion on the device plane, summed over the traced
    steps, as us/step, sorted descending;
  - a category roll-up (convolution/matmul, elementwise fusion,
    scatter, copy/convert, RNG, reduce, other) so the table reads as a
    roofline story rather than 100 mangled fusion names.

Usage: python scripts/analyze_trace.py profiles/bf16_full --steps 50
"""

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space, paths[-1]


def device_plane(space):
    """The TPU device plane (fall back: the busiest non-host plane,
    then any plane — keeps the script usable on CPU-only traces)."""
    planes = list(space.planes)
    for p in planes:
        if "TPU" in p.name and "XLA Op" not in p.name:
            return p
    def busy(p):
        return sum(len(l.events) for l in p.lines)
    non_host = [p for p in planes if "Host" not in p.name] or planes
    return max(non_host, key=busy)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=50,
                    help="steps the traced program ran (divisor)")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    space, path = load_xspace(args.trace_dir)
    plane = device_plane(space)

    # XPlane: stats/event metadata are interned per plane
    ev_meta = plane.event_metadata
    per_op_ps = defaultdict(int)     # display name -> total ps
    per_op_n = defaultdict(int)
    for line in plane.lines:
        # op lines only; step lines carry aggregate events that would
        # double-count
        if line.name.lower().startswith("step"):
            continue
        for ev in line.events:
            meta = ev_meta.get(ev.metadata_id)
            name = (meta.display_name or meta.name) if meta else "?"
            per_op_ps[name] += ev.duration_ps
            per_op_n[name] += 1

    total_ps = sum(per_op_ps.values())
    if total_ps == 0:
        raise SystemExit(f"no op events found on plane '{plane.name}'")

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
        "device_busy_us_per_step": us_step(total_ps),
        "categories": [
            {"category": c, "us_per_step": us_step(ps),
             "pct": round(100 * ps / total_ps, 1)}
            for c, ps in sorted(cat_ps.items(), key=lambda kv: -kv[1])],
        "top_ops": [
            {"op": n, "us_per_step": us_step(ps),
             "pct": round(100 * ps / total_ps, 1),
             "calls_per_step": round(per_op_n[n] / args.steps, 1)}
            for n, ps in rows[:args.top]],
    }
    out_path = os.path.join(args.trace_dir, "OPS.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[analyze_trace] {plane.name}: "
          f"{out['device_busy_us_per_step']} us/step device-busy "
          f"over {args.steps} steps", file=sys.stderr)
    for c in out["categories"]:
        print(f"  {c['category']:<26} {c['us_per_step']:>8} us/step "
              f"({c['pct']}%)", file=sys.stderr)
    print(out_path)


if __name__ == "__main__":
    main()
