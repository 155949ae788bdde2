"""Fold the refprotocol ladder CSVs into one summary.json.

The byte-level protocol run happened in two passes (documented in
summary.json): the interleaved pass's uniform rungs were invalidated by
measurement-host contention (background test suites sharing the single
client core inflated CLIENT-side tails to 5-11 s while the server
dispatched every batch in <60 ms — server_uniform.log / server.log hold
the proof), so uniform re-ran alone on an idle host. Random rows come
from the interleaved pass, uniform rows from the clean re-run.
"""

from __future__ import annotations

import csv
import json
import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/results_refprotocol"


def rows(path, pattern):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [r for r in csv.DictReader(f) if r["pattern"] == pattern]


def fold(prow, gate=10.0):
    sustained = [r for r in prow if float(r["p99"]) < gate]
    top = max(sustained, key=lambda r: int(r["rps"]), default=None)
    return {
        "rungs_run": len(prow),
        "max_sustainable_rps": int(top["rps"]) if top else 0,
        "gate_fired": any(float(r["p99"]) >= gate for r in prow),
        "p99_at_max_s": float(top["p99"]) if top else -1,
        "failed_requests_total": sum(int(r["fail"]) for r in prow),
    }


def main():
    summary = {
        "protocol": "reference byte-level: rungs 1,5,10,...(+5), 60 s/rung, "
                    "p99>=10 s gate (reference benchmarks/load_test.sh:3-13)",
        "hardware": "1x TPU v5e (axon)",
        "config": "final squad_real serving config "
                  "(= benchmarks/results_squad/summary.json server_env, "
                  "plus WARMUP_OVERFLOW_CAP=1024)",
        "passes": {
            "random": "interleaved pass (sweep.csv); uniform rungs of that "
                      "pass were client-contaminated and are superseded",
            "uniform": "clean idle-host re-run (sweep_uniform.csv)",
        },
        "incidents": (
            "interleaved first pass: the uniform pattern tripped the p99 "
            "gate at rung 5 because two prompt buckets were never warmed "
            "(compile stalls, not serving latency) — fixed by WARMUP_FULL=1 "
            "(commit 258e5cc). The uniform re-run's rungs >=240 were "
            "re-measured against a fresh server after a client-side "
            "incident: a concurrent pytest run starved the single-core "
            "host's asyncio loadgen for ~4 min, building an unrecoverable "
            "request backlog (oldest-wait 694 s > the 60 s client timeout; "
            "the server stayed healthy throughout — ladder_uniform.log "
            "holds the voided rungs)."),
        "patterns": {
            "random": fold(rows(f"{OUT}/sweep.csv", "random")),
            "uniform": fold(rows(f"{OUT}/sweep_uniform.csv", "uniform")),
        },
        "note": "a pattern with gate_fired=false sustained every rung run "
                "within the wall budget; the ladder was wall-capped, not "
                "server-saturated",
    }
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
