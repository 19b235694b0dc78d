"""utils: metric logging + step timing."""

import json
import time

import numpy as np

from mgat_graphsage_tpu.utils import MetricLogger, StepTimer, read_jsonl


def test_metric_logger_jsonl_and_csv(tmp_path):
    jp = str(tmp_path / "m.jsonl")
    cp = str(tmp_path / "m.csv")
    log = MetricLogger(jsonl_path=jp, csv_path=cp)
    log.log({"loss": 1.5, "mse": 2.0}, step=1)
    log.log({"loss": 1.0, "mse": 1.5}, step=2)
    rows = read_jsonl(jp)
    assert len(rows) == 2
    assert rows[0]["loss"] == 1.5 and rows[1]["step"] == 2
    lines = open(cp).read().strip().split("\n")
    assert len(lines) == 3  # header + 2 rows
    assert "loss" in lines[0]
    # non-scalar values are dropped, not crashed on
    log.log({"loss": 0.5, "array": np.zeros(3), "note": "ok"}, step=3)
    assert "array" not in read_jsonl(jp)[-1]
    assert read_jsonl(jp)[-1]["note"] == "ok"


def test_step_timer():
    t = StepTimer(window=5)
    for _ in range(8):
        with t.step():
            time.sleep(0.002)
    s = t.stats()
    assert s["steps"] == 5  # window capped
    assert 0.001 < s["mean_s"] < 0.2
    assert s["p50_s"] <= s["p95_s"]


def test_device_memory_stats_shape():
    from mgat_graphsage_tpu.utils import device_memory_stats

    stats = device_memory_stats()  # may be empty on CPU; must not crash
    assert isinstance(stats, dict)
