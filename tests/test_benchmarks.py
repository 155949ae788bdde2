"""Benchmark harness unit tests: trace generation semantics and the metrics
collector (the reference has none of these — SURVEY §4 'do better')."""

import time

import numpy as np
import pytest

from benchmarks.load_generator import generate_trace
from benchmarks.metrics.collector import MetricsCollector


@pytest.mark.parametrize("pattern", ["uniform", "poisson", "random"])
def test_trace_count_and_bounds(pattern):
    rps, duration = 10, 5
    ts = generate_trace(pattern, rps, duration, seed=42)
    assert all(0 <= t < duration * 1000 for t in ts)
    assert ts == sorted(ts)
    if pattern in ("uniform", "random"):
        assert len(ts) == rps * duration
    else:  # poisson drops arrivals past the horizon
        assert 0 < len(ts) <= rps * duration


def test_trace_seeded_reproducibility():
    a = generate_trace("poisson", 20, 3, seed=7)
    b = generate_trace("poisson", 20, 3, seed=7)
    c = generate_trace("poisson", 20, 3, seed=8)
    assert a == b
    assert a != c


def test_uniform_trace_spacing():
    ts = generate_trace("uniform", 4, 2, seed=1)  # 8 reqs over 2000ms
    gaps = np.diff(ts)
    assert np.allclose(gaps, 250, atol=1)


def test_trace_zero_requests():
    assert generate_trace("uniform", 0, 10) == []


def test_unknown_pattern_raises():
    with pytest.raises(ValueError):
        generate_trace("bursty", 1, 1)


def test_collector_metrics():
    c = MetricsCollector()
    c.start_test()
    for i in range(10):
        c.record_request_start(f"r{i}")
    for i in range(10):
        c.record_request_end(f"r{i}", success=(i != 9))
    time.sleep(0.01)
    c.end_test()
    m = c.calculate_metrics()
    assert m["total_requests"] == 10
    assert m["successful_requests"] == 9
    assert m["failed_requests"] == 1
    assert m["throughput_rps"] > 0
    lat = m["latency"]
    assert lat["min"] <= lat["p50"] <= lat["p95"] <= lat["p99"] <= lat["max"]


def test_collector_unknown_end_ignored():
    c = MetricsCollector()
    c.record_request_end("never-started", True)
    assert c.calculate_metrics()["total_requests"] == 0


def test_collector_save(tmp_path):
    c = MetricsCollector()
    c.record_request_start("a")
    c.record_request_end("a", True)
    out = tmp_path / "m.json"
    saved = c.save_results(str(out))
    import json
    assert json.loads(out.read_text()) == saved
