"""Same-session A/B of BatchProcessor pipeline knobs on ONE warmed engine.

The axon tunnel's per-session latency drift makes cross-session comparisons
of host-path changes meaningless (PERFORMANCE.md "Run-to-run variance"), so
this script builds/warms the engine ONCE and then measures the serving loop
under each processor configuration in the same session: FINALIZE_ASYNC
on/off, PREFETCH_WORKERS, STAGE_PROMPTS. Reports wall req/s per config plus
the (config-independent) device proxy so the engine anchor is on record.

Usage: python scripts/ab_processor.py [config ...]
  each config is a comma-separated env fragment, e.g.
  python scripts/ab_processor.py FINALIZE_ASYNC=0 FINALIZE_ASYNC=1 \
      FINALIZE_ASYNC=1,PREFETCH_WORKERS=2
  (default sweep below when no args are given)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(globals().get("__file__", "scripts/ab_processor.py")))))

DEFAULT_SWEEP = [
    "FINALIZE_ASYNC=0",
    "FINALIZE_ASYNC=1",
    "FINALIZE_ASYNC=1,PREFETCH_WORKERS=2",
    "FINALIZE_ASYNC=1,STAGE_PROMPTS=1",
    "FINALIZE_ASYNC=1,PREFETCH_WORKERS=2,STAGE_PROMPTS=1",
]


def main() -> None:
    os.environ.setdefault("QUANT_WEIGHTS", "int8")
    os.environ.setdefault("QUANT_ACT", "int8")
    mode = os.environ.get("BENCH_MODE", "full")
    config = os.environ.get("BENCH_CONFIG", "short_facts")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "20"))
    reps = int(os.environ.get("AB_REPS", "2"))
    sweep = sys.argv[1:] or DEFAULT_SWEEP

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_corpus
    from rag_serving_system_tpu.config import Settings
    from rag_serving_system_tpu.core.batch_processor import BatchProcessor
    from rag_serving_system_tpu.core.engine import RagEngine
    from rag_serving_system_tpu.core.request_queue import RequestQueue
    from rag_serving_system_tpu.models.configs import encoder_config_for

    settings = Settings(
        model_preset="tiny" if mode == "tiny" else "full",
        batch_buckets=[batch],
        encode_len_buckets=[32, 64],
        prompt_len_buckets=[64, 96, 128] if config == "short_facts"
        else [192, 256, 384, 448, 512, 640, 1024],
        max_new_tokens=10, max_k=16, max_batch_size=batch)
    enc_cfg = encoder_config_for(settings.model_preset)
    docs, emb = build_corpus(100 if config == "short_facts" else 1000,
                             enc_cfg.hidden_size, config=config)
    t0 = time.time()
    engine = RagEngine(settings, docs, emb)
    print(f"[ab] engine ready in {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    engine.warmup()
    print(f"[ab] warmup {time.time() - t0:.1f}s", file=sys.stderr)

    if config == "squad_real":
        with open("data/squad_real_queries.json") as f:
            qpool = json.load(f)
        queries = [qpool[i % len(qpool)] for i in range(batch)]
    else:
        queries = [f"What is the measured property number {i} of the subject?"
                   for i in range(batch)]

    engine.process(queries, [2] * batch)  # absorb first-touch costs

    # config-independent device anchor (chained generate, one sync)
    staged = engine.stage_prompts(engine.prepare(queries, [2] * batch))
    handle = engine.generate_tokens(staged=staged)
    engine.finalize_tokens(handle)
    t0 = time.time()
    for _ in range(8):
        handle = engine.generate_tokens(staged=staged)
    engine.finalize_tokens(handle)
    proxy_ms = (time.time() - t0) / 8 * 1e3
    print(f"[ab] device proxy {proxy_ms:.1f} ms/batch", file=sys.stderr)

    results = {}
    total = batch * n_batches
    for frag in sweep:
        saved = {}
        for kv in frag.split(","):
            k, v = kv.split("=")
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            best = 0.0
            for r in range(reps):
                rq = RequestQueue(max_batch_size=batch, max_wait_time=0.5,
                                  polling_interval=0.002)
                proc = BatchProcessor(rq, engine, polling_interval=0.002)
                proc.start()
                t0 = time.time()
                rids = [rq.add_request(queries[j % len(queries)], 2)
                        for j in range(total)]
                for rid in rids:
                    res = rq.get_result(rid, timeout=600)
                    assert res is not None and "result" in res, res
                rps = total / (time.time() - t0)
                proc.stop(drain_timeout=5.0)
                best = max(best, rps)
                print(f"[ab] {frag} rep{r}: {rps:.1f} req/s", file=sys.stderr)
            results[frag] = round(best, 1)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    print(json.dumps({"config": config, "batch": batch,
                      "device_proxy_ms_per_batch": round(proxy_ms, 1),
                      "wall_req_s_by_config": results}))


if __name__ == "__main__":
    main()
