"""HTTP load generator for the RAG service.

Same external contract as the reference's generator
(reference: benchmarks/load_generator.py): seeded arrival traces
(uniform / poisson / random), scheduled wall-clock dispatch, POST /rag then
poll GET /rag/result/<id> to completion, MetricsCollector JSON output, and
the same CLI flags (--endpoint --pattern --rps --duration --seed --timeout
--output).

Implementation is asyncio + aiohttp end to end (the reference mixes sync
`requests` calls into async workers via a 200-worker pool; a pure-async
client needs no worker cap — concurrency is bounded by open requests).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.metrics.collector import MetricsCollector  # noqa: E402


def generate_trace(pattern: str, rps: int, duration: int, seed: int | None = None):
    """Millisecond arrival timestamps for `rps * duration` requests."""
    rng = np.random.default_rng(seed)
    total = rps * duration
    duration_ms = duration * 1000
    if total == 0:
        return []
    if pattern == "uniform":
        interval = duration_ms / total
        ts = [min(int(round(i * interval)), duration_ms - 1) for i in range(total)]
    elif pattern == "poisson":
        gaps = rng.exponential(1000.0 / rps, size=total)
        arr = np.cumsum(gaps)
        ts = [int(round(t)) for t in arr if t < duration_ms]
    elif pattern == "random":
        ts = rng.integers(0, duration_ms, size=total).tolist()
    else:
        raise ValueError(f"unknown pattern: {pattern}")
    return sorted(int(t) for t in ts)


def load_queries(queries_file: str) -> list[str]:
    with open(queries_file, "r", encoding="utf-8") as f:
        return json.load(f)


async def send_request(session, endpoint: str, query: str, k: int,
                       poll_interval: float, timeout: float,
                       metrics: MetricsCollector, req_id: str,
                       max_new_tokens: int | None = None) -> None:
    metrics.record_request_start(req_id)
    deadline = time.time() + timeout
    try:
        # LOADGEN_SYNC_WAIT=N uses the synchronous POST extension
        # (?wait=N returns the completed result in one exchange); default
        # keeps the reference's submit→poll protocol
        sync_wait = float(os.environ.get("LOADGEN_SYNC_WAIT", "0"))
        post_url = (f"{endpoint}/rag?wait={sync_wait}" if sync_wait > 0
                    else f"{endpoint}/rag")
        payload = {"query": query, "k": k}
        if max_new_tokens is not None:
            payload["max_new_tokens"] = max_new_tokens
        async with session.post(post_url, json=payload) as resp:
            if resp.status != 200:
                metrics.record_request_end(req_id, False)
                return
            body = await resp.json()
            if body.get("status") == "complete":
                result = body.get("result") or {}
                ok = isinstance(result, dict) and "error" not in result
                metrics.record_request_end(req_id, ok)
                return
            request_id = body["request_id"]
        # opt-in server-side long-poll (extension; default 0 keeps the
        # reference's client-side polling protocol)
        lp = float(os.environ.get("LOADGEN_SERVER_TIMEOUT", "0"))
        suffix = f"?timeout={lp}" if lp > 0 else ""
        while time.time() < deadline:
            async with session.get(
                    f"{endpoint}/rag/result/{request_id}{suffix}") as resp:
                if resp.status == 200:
                    body = await resp.json()
                    if body.get("status") == "complete":
                        result = body.get("result") or {}
                        ok = isinstance(result, dict) and "error" not in result
                        metrics.record_request_end(req_id, ok)
                        return
            await asyncio.sleep(poll_interval)
        metrics.record_request_end(req_id, False)  # timed out
    except Exception:
        metrics.record_request_end(req_id, False)


async def run_load_test(endpoint: str, pattern: str, rps: int, duration: int,
                        seed: int | None, timeout: float, queries: list[str],
                        k: int = 2, poll_interval: float = 0.3,
                        query_sample: str = "cycle",
                        budget_spread: str | None = None) -> MetricsCollector:
    import aiohttp

    trace = generate_trace(pattern, rps, duration, seed)
    budgets = None
    if budget_spread:
        # per-request max_new_tokens drawn seeded-uniform [lo, hi] — the
        # completion-length-variance workload for DECODE_MODE=continuous
        lo, hi = (int(x) for x in budget_spread.split(","))
        brng = random.Random((seed if seed is not None else 0) ^ 0xB0D6E7)
        budgets = [brng.randint(lo, hi) for _ in trace]
    if query_sample == "random":
        # seeded uniform sampling over the pool — the realistic traffic shape
        # for cache studies (cycling visits every query exactly once per lap,
        # the worst case for any LRU). "cycle" below stays the default for
        # protocol continuity with earlier sweeps.
        qrng = random.Random(seed if seed is not None else 0)
        queries = [qrng.choice(queries) for _ in trace]
    metrics = MetricsCollector()
    metrics.start_test()
    t0 = time.time()
    tasks = []
    connector = aiohttp.TCPConnector(
        limit=int(os.environ.get("LOADGEN_CONNECTIONS", "512")))
    async with aiohttp.ClientSession(connector=connector) as session:
        for i, ts_ms in enumerate(trace):
            # schedule each request at its wall-clock arrival time
            delay = t0 + ts_ms / 1000.0 - time.time()
            if delay > 0:
                await asyncio.sleep(delay)
            query = queries[i % len(queries)]
            tasks.append(asyncio.create_task(send_request(
                session, endpoint, query, k, poll_interval, timeout,
                metrics, f"req-{i}",
                max_new_tokens=budgets[i] if budgets else None)))
        if tasks:
            await asyncio.gather(*tasks)
    metrics.end_test()
    return metrics


def main() -> None:
    parser = argparse.ArgumentParser(description="RAG service load generator")
    parser.add_argument("--endpoint", default="http://localhost:8000")
    parser.add_argument("--pattern", default="uniform",
                        choices=["uniform", "poisson", "random"])
    parser.add_argument("--rps", type=int, default=1)
    parser.add_argument("--duration", type=int, default=10, help="seconds")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--timeout", type=float, default=60.0)
    parser.add_argument("--k", type=int, default=2)
    parser.add_argument("--poll-interval", type=float,
                        default=float(os.environ.get("POLLING_INTERVAL", "0.3")))
    parser.add_argument("--queries-file",
                        default=os.environ.get("DOCUMENT_QUERIES_FILE",
                                               "data/short_facts_queries.json"))
    parser.add_argument("--query-sample", default="cycle",
                        choices=["cycle", "random"],
                        help="pool traversal: sequential cycle (default) or "
                             "seeded uniform random sampling")
    parser.add_argument("--output", default=None, help="results JSON path")
    parser.add_argument("--budget-spread", default=None, metavar="LO,HI",
                        help="per-request max_new_tokens drawn seeded-uniform"
                             " [LO, HI] (completion-length-variance workload)")
    args = parser.parse_args()

    queries = load_queries(args.queries_file)
    metrics = asyncio.run(run_load_test(
        args.endpoint, args.pattern, args.rps, args.duration, args.seed,
        args.timeout, queries, k=args.k, poll_interval=args.poll_interval,
        query_sample=args.query_sample, budget_spread=args.budget_spread))
    metrics.print_summary()
    if args.output:
        metrics.save_results(args.output)
        print(f"saved: {args.output}")


if __name__ == "__main__":
    main()
