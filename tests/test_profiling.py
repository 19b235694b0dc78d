"""Profiling surface (SURVEY.md §5 aux subsystems: the reference has no
tracing at all — ``pycaret.py:296`` wall-clock prints only; this repo
adds ``jax.profiler`` traces, step timers, and memory stats)."""

import os
import time

import jax
import jax.numpy as jnp

from mgat_graphsage_tpu.utils import StepTimer, device_memory_stats, trace


def test_step_timer_stats():
    t = StepTimer(window=4)
    assert t.stats() == {}
    for _ in range(6):
        with t.step():
            time.sleep(0.001)
    s = t.stats()
    assert s["steps"] == 4                      # rolling window capped
    assert 0.0005 < s["mean_s"] < 0.5
    assert s["p50_s"] <= s["p95_s"]


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    # jax writes plugins/profile/<ts>/*.xplane.pb under the logdir
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir)
             for f in fs if f.endswith(".xplane.pb")]
    assert found, f"no xplane under {logdir}"
    assert os.path.getsize(found[0]) > 0


def test_trace_stops_on_error(tmp_path):
    # the finally-block must stop the profiler so a later trace can start
    try:
        with trace(str(tmp_path / "t1")):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    with trace(str(tmp_path / "t2")):
        jax.block_until_ready(jnp.zeros(8) + 1)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    # CPU backends may expose nothing; when present, values are ints
    for per_dev in stats.values():
        for v in per_dev.values():
            assert isinstance(v, int)
