"""Load-test metrics: latency distribution + throughput accounting.

Same metric set and JSON output schema as the reference's collector
(reference: benchmarks/metrics/collector.py:34-79): total/successful
throughput, latency min/max/mean/p50/p95/p99, success/error counts.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional

import numpy as np


class MetricsCollector:
    def __init__(self):
        self.request_starts: Dict[str, float] = {}
        self.latencies: list[float] = []
        self.successes = 0
        self.errors = 0
        self.test_start: Optional[float] = None
        self.test_end: Optional[float] = None

    def start_test(self) -> None:
        self.test_start = time.time()

    def end_test(self) -> None:
        self.test_end = time.time()

    def record_request_start(self, request_id: str) -> None:
        if self.test_start is None:
            self.start_test()
        self.request_starts[request_id] = time.time()

    def record_request_end(self, request_id: str, success: bool) -> None:
        start = self.request_starts.pop(request_id, None)
        if start is None:
            return
        if success:
            self.latencies.append(time.time() - start)
            self.successes += 1
        else:
            self.errors += 1

    def calculate_metrics(self) -> dict:
        end = self.test_end or time.time()
        duration = max(end - (self.test_start or end), 1e-9)
        total = self.successes + self.errors
        metrics = {
            "duration_seconds": duration,
            "total_requests": total,
            "successful_requests": self.successes,
            "failed_requests": self.errors,
            "throughput_rps": total / duration,
            "successful_throughput_rps": self.successes / duration,
        }
        if self.latencies:
            lat = np.asarray(self.latencies)
            metrics["latency"] = {
                "min": float(lat.min()),
                "max": float(lat.max()),
                "mean": float(lat.mean()),
                "p50": float(np.percentile(lat, 50)),
                "p95": float(np.percentile(lat, 95)),
                "p99": float(np.percentile(lat, 99)),
            }
        return metrics

    def save_results(self, path: str) -> dict:
        metrics = self.calculate_metrics()
        with open(path, "w", encoding="utf-8") as f:
            json.dump(metrics, f, indent=2)
        return metrics

    def print_summary(self) -> None:
        m = self.calculate_metrics()
        print(f"requests: {m['total_requests']} "
              f"(ok {m['successful_requests']} / fail {m['failed_requests']})")
        print(f"throughput: {m['throughput_rps']:.2f} rps "
              f"(successful {m['successful_throughput_rps']:.2f})")
        if "latency" in m:
            lat = m["latency"]
            print("latency s: " + " ".join(
                f"{k}={lat[k]:.3f}" for k in ("min", "mean", "p50", "p95", "p99", "max")))
