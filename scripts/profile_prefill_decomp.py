"""Decompose the cold (no-prefix) generate program at the bench shape.

profile_prefill_ceiling.py re-measured the chip: bf16 matmul ~185 TF/s,
int8 ~370 TOP/s (round 2's 171 was dispatch-overhead pollution). At those
ceilings the batch-32 x 448-token prefill matmuls cost ~100 ms — but the
engine's _noprefix proxy is ~281 ms/batch. This script attributes the gap:

  A. generate(max_new_tokens=1)  ~= prefill alone
  B. generate(max_new_tokens=10) -> decode slope
  C. prefill with flash attention vs the einsum fallback
  D. W8A8 on vs off (weight-only int8)

Method: N same-shape dispatches queued back-to-back, one sync (device
executes serially; the ~30 ms tunnel overhead amortizes across N).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rag_serving_system_tpu.models.configs import decoder_config_for
from rag_serving_system_tpu.models.weights import init_decoder_params
from rag_serving_system_tpu.models.qwen2 import generate
from rag_serving_system_tpu.ops.quant import quantize_decoder_params

B = int(os.environ.get("B", "32"))
P = int(os.environ.get("P", "448"))
REPS = int(os.environ.get("REPS", "4"))


def timed(label, fn, reps=REPS):
    out = fn()
    np.asarray(out)[:2]  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(out)[:2]
    dt = (time.time() - t0) / reps
    print(f"{label:44s} {dt*1e3:8.1f} ms/call", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}  B={B} P={P}")
    cfg = decoder_config_for("full")
    params = init_decoder_params(cfg, 0, jnp.bfloat16)
    params_q = quantize_decoder_params(params, bits=8)

    rng = jax.random.PRNGKey(1)
    ids = jnp.asarray(np.random.randint(10, 1000, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), jnp.int32)
    rv = jnp.ones((B,), bool)

    variants = [
        ("prefill-only bf16 (mnt=1, flash)", params, False, 1, {}),
        ("prefill-only W8 (mnt=1, flash)", params_q, False, 1, {}),
        ("prefill-only W8A8 (mnt=1, flash)", params_q, True, 1, {}),
        ("prefill-only W8A8 (mnt=1, einsum-attn)", params_q, True, 1,
         {"RAG_DISABLE_FLASH": "1"}),
        ("full W8A8 (mnt=10, flash)", params_q, True, 10, {}),
    ]
    for label, p, aq, mnt, env in variants:
        for k, v in env.items():
            os.environ[k] = v
        if env:
            # env-var variants (RAG_DISABLE_FLASH) only take effect at
            # TRACE time; an identical jit signature would silently reuse
            # the cached flash executable (review finding, round 4)
            jax.clear_caches()
        try:
            timed(label, lambda: generate(
                p, cfg, ids, mask, rng, max_new_tokens=mnt, do_sample=True,
                dtype=jnp.bfloat16, row_valid=rv, act_quant=aq))
        except Exception as e:  # einsum fallback may OOM at this shape
            print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        for k in env:
            del os.environ[k]


if __name__ == "__main__":
    main()
