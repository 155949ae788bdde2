"""Decompose the serving loop's per-batch HOST costs on a warmed engine.

The device-side proxy (bench.py) anchors chip time; this script times the
host-side pieces the dispatch/prefetch/finalize threads pay per batch —
prepare (stage 1), stage_prompts (tokenize+pad+puts), generate dispatch,
finalize (transfer wait + detok) — each as a steady-state mean over N
batches, so the wall-vs-proxy gap can be attributed to a specific stage
instead of "the host". Run with the same env as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(globals().get("__file__", "scripts/profile_host.py")))))


def main() -> None:
    os.environ.setdefault("QUANT_WEIGHTS", "int8")
    os.environ.setdefault("QUANT_ACT", "int8")
    mode = os.environ.get("BENCH_MODE", "full")
    config = os.environ.get("BENCH_CONFIG", "short_facts")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    reps = int(os.environ.get("PROFILE_BATCHES", "16"))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_corpus
    from rag_serving_system_tpu.config import Settings
    from rag_serving_system_tpu.core.engine import RagEngine
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
    engine = RagEngine(settings, docs, emb)
    engine.warmup()

    if config == "squad_real":
        with open("data/squad_real_queries.json") as f:
            qpool = json.load(f)
        queries = [qpool[i % len(qpool)] for i in range(batch)]
    else:
        queries = [f"What is the measured property number {i} of the subject?"
                   for i in range(batch)]
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
