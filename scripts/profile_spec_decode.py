"""On-chip A/B of speculative vs sequential greedy decode (full-size model).

Measures, at the decode-heavy bench row's shape (B=32, prompt 512,
max_new_tokens=64, int8 weights — the `mnt64` regime where sequential decode
sits at the weight-streaming roofline, PERFORMANCE.md "Decode-heavy regime"):

  base      — generate(do_sample=False), the 1-token-per-weight-stream loop
  spec g=N  — generate(spec_gamma=N): N history-lookup drafts verified per
              multi-position forward (models/qwen2.py _spec_decode_loop)
  accept    — verify iterations + implied tokens/iteration from
              _spec_decode_loop's counter (the honesty metric: speedup
              claims are only as good as the acceptance the workload gives)

Both arms are bit-exact by construction (tests/test_spec_decode.py); this
script also re-asserts token equality on-device before timing.

Timing: chained dispatches, ONE host sync (axon tunnel adds ~26 ms per
sync; block_until_ready is a no-op on this backend).

Usage:  BATCH=32 PROMPT=512 MNT=64 GAMMAS=2,4,6,8 QUANT=int8 \
        python scripts/profile_spec_decode.py
Prints one JSON line per arm.
"""

from __future__ import annotations

import json
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

from rag_serving_system_tpu.models.configs import QWEN25_15B, QWEN2_TINY
from rag_serving_system_tpu.models.qwen2 import (_spec_decode_loop, generate,
                                                 prefill)
from rag_serving_system_tpu.models.weights import init_decoder_params

REPS = int(os.environ.get("REPS", "4"))
BATCH = int(os.environ.get("BATCH", "32"))
PROMPT = int(os.environ.get("PROMPT", "512"))
MNT = int(os.environ.get("MNT", "64"))
GAMMAS = [int(x) for x in os.environ.get("GAMMAS", "2,4,6,8").split(",")]
TINY = os.environ.get("TINY") == "1"


def main() -> None:
    cfg = QWEN2_TINY if TINY else QWEN25_15B
    dtype = jnp.float32 if TINY else jnp.bfloat16
    params = init_decoder_params(cfg, dtype=dtype)
    if os.environ.get("QUANT", "int8") == "int8" and not TINY:
        from rag_serving_system_tpu.ops.quant import quantize_decoder_params
        params = quantize_decoder_params(params, bits=8)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, cfg.vocab_size - 10, (BATCH, PROMPT)),
                      jnp.int32)
    mask = jnp.ones((BATCH, PROMPT), jnp.int32)
    key = jax.random.PRNGKey(0)
    backend = jax.default_backend()
    print(f"[spec] backend={backend} B={BATCH} P={PROMPT} mnt={MNT} "
          f"cfg={'tiny' if TINY else 'full'}", file=sys.stderr)

    def run(gamma):
        return generate(params, cfg, ids, mask, key, max_new_tokens=MNT,
                        do_sample=False, dtype=dtype, spec_gamma=gamma)

    def timed(gamma):
        out = run(gamma)              # compile + correctness handle
        np.asarray(out)               # sync
        t0 = time.time()
        for _ in range(REPS):
            out = run(gamma)
        np.asarray(out)               # one sync for the chain
        ms = (time.time() - t0) / REPS * 1e3
        return ms, np.asarray(out)

    base_ms, base_toks = timed(0)
    # non-pad = emitted (greedy may emit pad_token_id as a real token; with
    # random weights over a 150k vocab that's ~never, and mnt dominates)
    emitted = (base_toks != cfg.pad_token_id).sum(axis=1)
    print(json.dumps({"arm": "base", "ms_per_batch": round(base_ms, 1),
                      "ms_per_token": round(base_ms / MNT, 2),
                      "mean_emitted": float(emitted.mean())}))

    for g in GAMMAS:
        ms, toks = timed(g)
        exact = bool((toks == base_toks).all())
        # accept telemetry: run the loop once more with its iteration counter
        logits0, cache = prefill(params, cfg, ids, mask, MNT + g, dtype=dtype)
        out, iters = _spec_decode_loop(params, cfg, logits0, cache, mask,
                                       MNT, g, dtype, None, PROMPT, ids)
        iters = int(iters)
        em = float((np.asarray(out) != cfg.pad_token_id).sum(axis=1).mean())
        print(json.dumps({
            "arm": f"spec_g{g}", "ms_per_batch": round(ms, 1),
            "ms_per_token": round(ms / MNT, 2),
            "exact_match_vs_base": exact,
            "verify_iters": iters,
            "tokens_per_iter": round((em - 1) / max(iters, 1), 2),
            "speedup_vs_base": round(base_ms / ms, 2)}))


if __name__ == "__main__":
    main()
