"""Stage profiling for the generator on the real chip: prefill vs decode.

axon quirk: block_until_ready is a no-op — timings force a tiny host
transfer of the output instead. Usage:
  QUANT=int8 BATCH=32 PLEN=96 python scripts/profile_decode.py
Optionally JAX_TRACE_DIR=/tmp/trace records a jax.profiler trace of one
warm generate() call (VERDICT #9: verify the int8 dequant actually fuses).
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

from rag_serving_system_tpu.models.configs import QWEN25_15B
from rag_serving_system_tpu.models.qwen2 import generate
from rag_serving_system_tpu.models.weights import init_decoder_params


def timed(fn, reps=3):
    """Median wall time; sync via a tiny host transfer (axon-safe)."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(out[:1, :1])
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    cfg = QWEN25_15B
    batch = int(os.environ.get("BATCH", "32"))
    plen = int(os.environ.get("PLEN", "96"))
    new = int(os.environ.get("NEW", "10"))
    quant = os.environ.get("QUANT", "int8")
    act_quant = os.environ.get("QUANT_ACT", "none") == "int8"

    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    if quant in ("int8", "int4"):
        from rag_serving_system_tpu.ops.quant import quantize_decoder_params
        params = quantize_decoder_params(
            params, bits=4 if quant == "int4" else 8,
            group=int(os.environ.get("GROUP", "128")))
    else:
        params = jax.device_put(params)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, cfg.vocab_size - 10, (batch, plen)),
                      dtype=jnp.int32)
    mask = jnp.ones((batch, plen), jnp.int32)
    key = jax.random.PRNGKey(0)

    def full():
        return generate(params, cfg, ids, mask, key, max_new_tokens=new,
                        do_sample=True, act_quant=act_quant)

    def prefill_only():
        return generate(params, cfg, ids, mask, key, max_new_tokens=1,
                        do_sample=True, act_quant=act_quant)

    print(f"[prof] backend={jax.default_backend()} quant={quant} "
          f"act_quant={act_quant} batch={batch} plen={plen} new={new}", file=sys.stderr)
    t0 = time.time(); np.asarray(full()[:1, :1])
    print(f"[prof] compile(full) {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time(); np.asarray(prefill_only()[:1, :1])
    print(f"[prof] compile(prefill) {time.time()-t0:.1f}s", file=sys.stderr)

    t_full = timed(full)
    t_pre = timed(prefill_only)
    per_tok = (t_full - t_pre) / max(new - 1, 1)
    print(f"full={t_full*1e3:.1f}ms prefill+1={t_pre*1e3:.1f}ms "
          f"decode/token={per_tok*1e3:.2f}ms "
          f"({batch} rows -> {batch/t_full:.1f} req/s at gen stage)")

    trace_dir = os.environ.get("JAX_TRACE_DIR")
    if trace_dir:
        from rag_serving_system_tpu.utils.timing import device_trace
        with device_trace(trace_dir):
            np.asarray(full()[:1, :1])
        print(f"[prof] trace written to {trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
