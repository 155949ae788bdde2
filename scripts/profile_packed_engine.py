"""Diagnose the packed-path regression THROUGH the engine (round 4).

Microbenchmarks (profile_packed_decomp.py) show packed generate beating
padded at matched shapes (192 vs 245 ms at T=9216/P=448). Yet the bench's
engine proxy went 281 -> 437 ms when packing landed. This script builds the
REAL bench engine (squad_real corpus + queries, no prefix cache), prints
exactly what _stage_packed produces (row token lengths, chosen T bucket),
and times the packed dispatch vs the padded dispatch from the same engine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("QUANT_WEIGHTS", "int8")
os.environ.setdefault("QUANT_ACT", "int8")
os.environ["PREFIX_CACHE"] = "0"

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_corpus
from rag_serving_system_tpu.config import Settings
from rag_serving_system_tpu.core.engine import RagEngine

import json

B = 32


def timed_dispatch(engine, staged, reps=6):
    h = engine.generate_tokens(staged=staged)
    engine.finalize_tokens(h)  # compile+warm
    t0 = time.time()
    for _ in range(reps):
        h = engine.generate_tokens(staged=staged)
    engine.finalize_tokens(h)
    return (time.time() - t0) / reps * 1e3


def main():
    settings = Settings(
        model_preset="full", batch_buckets=[B], encode_len_buckets=[32, 64],
        prompt_len_buckets=[192, 256, 384, 448, 512, 640, 1024],
        max_new_tokens=10, max_k=16, max_batch_size=B)
    docs, emb = build_corpus(1000, 1024, config="squad_real")
    engine = RagEngine(settings, docs, emb)
    with open("data/squad_real_queries.json") as f:
        all_q = json.load(f)
    queries = [all_q[i % len(all_q)] for i in range(B)]

    prepared = engine.prepare(queries, [2] * B)
    print(f"packed_p={engine.packed_p} t_buckets={engine.packed_t_buckets}")

    staged = engine.stage_prompts(prepared)
    if staged[0] != "packed":
        print(f"gate chose PADDED staging (shape {staged[1].shape}) — "
              "packed bucket would not undercut the padded total")
        ms = timed_dispatch(engine, staged)
        print(f"padded dispatch: {ms:.1f} ms/batch")
        return
    stream = staged[1]
    t = stream.shape[1]
    seg = np.asarray(stream[1])
    lens = [int((seg == i).sum()) for i in range(B)]
    print(f"row lens: min={min(lens)} mean={sum(lens)/B:.0f} max={max(lens)} "
          f"sum={sum(lens)} -> staged T={t}")

    ms = timed_dispatch(engine, staged)
    print(f"packed dispatch: {ms:.1f} ms/batch")

    engine.packed = False
    staged_pad = engine.stage_prompts(prepared)
    ids = staged_pad[1]
    print(f"padded staged shape: {ids.shape}")
    ms = timed_dispatch(engine, staged_pad)
    print(f"padded dispatch: {ms:.1f} ms/batch")


if __name__ == "__main__":
    main()
