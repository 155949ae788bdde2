"""Decompose the serving loop's per-batch HOST costs on a warmed engine.

The device-side proxy (bench.py) anchors chip time; this script times the
host-side pieces the dispatch/prefetch/finalize threads pay per batch —
prepare (stage 1), stage_prompts (tokenize+pad+puts), generate dispatch,
finalize (transfer wait + detok) — each as a steady-state mean over N
batches, so the wall-vs-proxy gap can be attributed to a specific stage
instead of "the host". Uses scripts/_harness.py (the exact bench.py
configuration); run with the same env as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(
    globals().get("__file__", "scripts/profile_host.py"))))

from _harness import build_bench_engine  # noqa: E402


def main() -> None:
    reps = int(os.environ.get("PROFILE_BATCHES", "16"))
    engine, queries, batch, _ = build_bench_engine()
    ks = [2] * batch
    engine.process(queries, ks)  # absorb first-touch costs / prime caches

    stages = {"prepare": 0.0, "stage_prompts": 0.0, "dispatch": 0.0,
              "finalize": 0.0, "wall": 0.0}
    for _ in range(reps):
        t0 = time.time()
        prompts = engine.prepare(queries, ks)
        t1 = time.time()
        staged = engine.stage_prompts(prompts)
        t2 = time.time()
        handle = engine.generate_tokens(staged=staged)
        t3 = time.time()
        engine.finalize_tokens(handle)
        t4 = time.time()
        stages["prepare"] += t1 - t0
        stages["stage_prompts"] += t2 - t1
        stages["dispatch"] += t3 - t2
        stages["finalize"] += t4 - t3
        stages["wall"] += t4 - t0
    out = {k: round(v / reps * 1e3, 2) for k, v in stages.items()}
    out["note"] = ("serial decomposition: finalize includes the device wait; "
                   "in the pipelined loop prepare/stage ride other threads "
                   "and finalize rides the finalize worker")
    qstats = engine.query_cache_stats()
    if qstats is not None:
        out["query_cache_hit_rate"] = round(qstats["hit_rate"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
