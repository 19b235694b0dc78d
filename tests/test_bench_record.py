"""Unit tests for bench.py's cpu_fallback record attachment.

When the TPU relay is dead bench.py emits a labeled cpu_fallback JSON
line and attaches the newest real-chip measurement from the committed
BENCH_r*.json round records (driver format: JSON line wrapped under a
"parsed" key) so the round record still points at hardware numbers.
"""
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from bench import last_real_tpu_record


def _write(path, parsed, wrap=True):
    rec = {"n": 1, "rc": 0, "parsed": parsed} if wrap else parsed
    path.write_text(json.dumps(rec))


def test_picks_newest_real_tpu_record(tmp_path):
    _write(tmp_path / "BENCH_r01.json",
           {"value": 40000.0, "vs_baseline": 533.0, "backend": "tpu"})
    _write(tmp_path / "BENCH_r02.json",
           {"value": 61454.2, "vs_baseline": 1567.02})  # no backend key=tpu
    out = last_real_tpu_record(str(tmp_path))
    assert out == {
        "last_real_tpu_value": 61454.2,
        "last_real_tpu_vs_baseline": 1567.02,
        "last_real_tpu_record": "BENCH_r02.json",
    }


def test_skips_fallback_rounds(tmp_path):
    _write(tmp_path / "BENCH_r01.json",
           {"value": 40000.0, "vs_baseline": 533.0, "backend": "tpu"})
    _write(tmp_path / "BENCH_r03.json",
           {"value": 2.3, "vs_baseline": 0.03, "backend": "cpu_fallback"})
    out = last_real_tpu_record(str(tmp_path))
    assert out["last_real_tpu_record"] == "BENCH_r01.json"
    assert out["last_real_tpu_value"] == 40000.0


def test_accepts_unwrapped_record(tmp_path):
    _write(tmp_path / "BENCH_r01.json",
           {"value": 123.0, "vs_baseline": 2.0, "backend": "tpu"},
           wrap=False)
    out = last_real_tpu_record(str(tmp_path))
    assert out["last_real_tpu_value"] == 123.0


def test_empty_dir_and_malformed_records(tmp_path):
    assert last_real_tpu_record(str(tmp_path)) == {}
    (tmp_path / "BENCH_r02.json").write_text("{not json")
    _write(tmp_path / "BENCH_r01.json",
           {"value": 9.0, "vs_baseline": 1.0, "backend": "tpu"})
    # malformed newest record is skipped, older real record still found
    out = last_real_tpu_record(str(tmp_path))
    assert out["last_real_tpu_record"] == "BENCH_r01.json"


def test_repo_records_resolve_to_real_tpu():
    # the committed round records must yield a real-chip pointer
    out = last_real_tpu_record(REPO_ROOT)
    assert out and out["last_real_tpu_value"] > 1000


def test_newest_by_numeric_round_not_lexicographic(tmp_path):
    # 'BENCH_r9.json' > 'BENCH_r10.json' lexicographically; the scraper
    # must sort by the numeric suffix
    _write(tmp_path / "BENCH_r9.json",
           {"value": 9.0, "vs_baseline": 1.0, "backend": "tpu"})
    _write(tmp_path / "BENCH_r10.json",
           {"value": 10.0, "vs_baseline": 2.0, "backend": "tpu"})
    out = last_real_tpu_record(str(tmp_path))
    assert out["last_real_tpu_record"] == "BENCH_r10.json"


def test_torch_cpu_baseline_artifact():
    """The quiet-floor torch baseline is a committed artifact (VERDICT r3
    next #9), not a magic constant: it must parse, carry measurement
    provenance, and sit within the historically measured quiet range."""
    with open(os.path.join(REPO_ROOT, "BASELINE_TORCH_CPU.json")) as f:
        art = json.load(f)
    floor = float(art["quiet_floor"])
    assert art["unit"] == "molecules/sec"
    prov = art["provenance"]
    assert len(prov) >= 2 and all("evidence" in p for p in prov)
    quiet = [p["mol_per_s"] for p in prov
             if "conten" not in p["evidence"].lower()]
    # conservative: the floor must not exceed the best quiet measurement
    assert floor <= max(quiet)
    assert floor >= min(quiet) * 0.9
