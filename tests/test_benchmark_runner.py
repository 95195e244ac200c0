"""Smoke tests for the benchmark runner (small workloads on CPU)."""

import json

import numpy as np

from kompass_core_tpu.benchmark import BenchmarkRunner, measure_performance
from kompass_core_tpu.utils.logger import get_available_accelerators


def test_measure_performance_schema():
    r = measure_performance("noop", lambda: None, warmup=1, runs=5)
    assert r["name"] == "noop"
    assert r["runs"] == 5
    for key in ("mean_ms", "min_ms", "p50_ms", "p99_ms"):
        assert key in r and r[key] >= 0.0


def test_runner_small_workloads(tmp_path):
    runner = BenchmarkRunner()
    runner.bench_critical_zone_dense()
    runner.bench_mapper_dense()
    payload = runner.export(str(tmp_path / "bench.json"))
    assert payload["platform"]
    assert {b["name"] for b in payload["benchmarks"]} == {
        "CriticalZone_Dense_Scan",
        "Mapper_Dense_400x400",
    }
    # file round trips
    loaded = json.load(open(tmp_path / "bench.json"))
    assert loaded["benchmarks"][0]["mean_ms"] > 0


def test_accelerator_enumeration():
    accs = get_available_accelerators()
    assert len(accs) >= 1
    assert all(isinstance(a, str) for a in accs)


def test_run_repeated_keeps_median_estimate():
    """run_repeated merges N suite passes per workload by MEDIAN slope
    estimate (tunnel interference is two-sided: it can inflate or
    deflate a single slope) and records every raw estimate."""
    runner = BenchmarkRunner()
    vals = iter([3.0, 1.0, 2.0])

    def fake_run_all():
        v = next(vals)
        runner.results = [
            {"name": "W", "runs": 20, "mean_ms": v, "min_ms": v,
             "p50_ms": v, "p99_ms": v, "method": "slope"}
        ]
        return runner.results

    runner.run_all = fake_run_all
    merged = runner.run_repeated(3)
    assert len(merged) == 1
    assert merged[0]["p50_ms"] == 2.0
    assert merged[0]["estimates_ms"] == [3.0, 1.0, 2.0]
    assert merged[0]["method"] == "slope_median_of_3"


def test_measure_throughput_slope_schema():
    """Slope method: marginal per-dispatch time from chained distinct
    dispatches, with completion forced by a value fetch."""
    import time as _time

    from kompass_core_tpu.benchmark.runner import measure_throughput_slope

    calls = []

    def dispatch(v):
        calls.append(v)
        _time.sleep(0.001)
        return v

    from kompass_core_tpu.benchmark.runner import slope_variants_needed

    n = slope_variants_needed(10, 30)
    r = measure_throughput_slope(
        "T", dispatch, list(range(n)), fetch=lambda o: float(o),
        n_lo=10, n_hi=30,
    )
    assert r["method"] == "slope"
    assert 0.5 < r["mean_ms"] < 5.0  # ~1 ms per dispatch
    # one variant per dispatch across warmup + both chains: no reuse
    assert len(calls) == len(set(calls)) == n
    # undersized variant lists are rejected, not silently reused
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        measure_throughput_slope(
            "T", dispatch, list(range(30)), fetch=lambda o: float(o),
            n_lo=10, n_hi=30,
        )
