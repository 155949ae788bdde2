"""Decompose the decode cost's KV-length slope on the real chip.

Measured end-to-end decode is ~2.5 ms/token at prompt 96 rising to
~4.1 ms/token at prompt 512 (profile_decode.py). The LENGTH-DEPENDENT part
of that should be pure KV-cache bandwidth (read K and V once per token);
this script measures, per cache length T:

  stream   — jnp.sum over the full stacked (L, B, T, Hk, D) K+V cache:
             the pure HBM read floor for the bytes attention must touch
  attn     — the 28-layer GQA attention chain exactly as decode_step runs
             it (dynamic_slice per layer out of the stacked cache + einsum
             attention at q_len=1), WITHOUT the matmul/MLP work: isolates
             what attention adds over the stream floor
  step     — one full decode_step (weights + attention + sampling-free
             logits): the end-to-end per-token cost

All three are chained N times inside one jit with one final host sync
(the axon tunnel adds ~26 ms per host-synced dispatch; block_until_ready
is a no-op — see PERFORMANCE.md "Run-to-run variance").

Usage:  BATCH=32 QUANT=int8 python scripts/profile_decode_slope.py
Prints one JSON line per T with ms/token for each variant and the
implied GB/s of the stream floor.
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
from rag_serving_system_tpu.models.layers import attention
from rag_serving_system_tpu.models.qwen2 import KVCache, decode_step
from rag_serving_system_tpu.models.weights import init_decoder_params

REPS = int(os.environ.get("REPS", "8"))


def timed(fn, *args):
    """Median wall ms of fn(*args) with one tiny host sync, 3 trials."""
    out = fn(*args)                     # compile + warm
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.time() - t0)
    return sorted(ts)[1] * 1e3


def main():
    tiny = os.environ.get("TINY", "0") == "1"
    cfg = QWEN2_TINY if tiny else QWEN25_15B
    batch = int(os.environ.get("BATCH", "32"))
    quant = os.environ.get("QUANT", "int8")
    lens = [int(x) for x in os.environ.get(
        "LENS", "128,256,512,768" if not tiny else "32,64").split(",")]

    params = init_decoder_params(cfg, dtype=jnp.bfloat16)
    if quant == "int8" and not tiny:
        from rag_serving_system_tpu.ops.quant import quantize_decoder_params
        params = quantize_decoder_params(params, bits=8)
    else:
        params = jax.device_put(params)

    L, Hk, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    Hq = cfg.num_heads
    kv_dtype = jnp.bfloat16

    @jax.jit
    def stream(K, V):
        acc = jnp.float32(0)
        for _ in range(REPS):
            acc = acc + jnp.sum(K.astype(jnp.float32)) + jnp.sum(
                V.astype(jnp.float32))
        return acc

    def attn_chain(K, V, q, bias):
        """REPS x the per-token attention pass: every layer dynamic-slices
        its cache slab and runs the q_len=1 GQA einsum chain (the exact ops
        decode_step's scan body runs, minus matmuls/MLP)."""
        def one_pass(q):
            def body(carry, li):
                ck = jax.lax.dynamic_slice_in_dim(K, li, 1, 0)[0]
                cv = jax.lax.dynamic_slice_in_dim(V, li, 1, 0)[0]
                a = attention(q, ck, cv, bias)
                return carry + jnp.sum(a.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(L))
            return acc
        acc = jnp.float32(0)
        for r in range(REPS):
            # perturb q so XLA can't CSE the repetitions
            acc = acc + one_pass(q + jnp.bfloat16(r * 1e-3))
        return acc

    attn_chain = jax.jit(attn_chain)

    def steps(K, V, tok, pmask, plen):
        cache = KVCache(k=K, v=V)
        logits = None
        for s in range(REPS):
            logits, cache = decode_step(
                params, cfg, cache, tok, jnp.int32(s), plen, pmask)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits

    steps = jax.jit(steps, static_argnames=("plen",))

    rng = np.random.default_rng(0)
    print(f"[slope] backend={jax.default_backend()} batch={batch} "
          f"quant={quant} reps={REPS} layers={L} Hk={Hk} D={D}",
          file=sys.stderr)
    for T in lens:
        t_total = T + REPS + 2
        K = jnp.asarray(rng.standard_normal((L, batch, t_total, Hk, D)),
                        dtype=kv_dtype)
        V = jnp.asarray(rng.standard_normal((L, batch, t_total, Hk, D)),
                        dtype=kv_dtype)
        q = jnp.asarray(rng.standard_normal((batch, 1, Hq, D)),
                        dtype=jnp.bfloat16)
        bias = jnp.zeros((batch, 1, 1, t_total), jnp.float32)
        tok = jnp.ones((batch,), jnp.int32)
        pmask = jnp.ones((batch, T), jnp.int32)

        ms_stream = timed(stream, K, V) / REPS
        ms_attn = timed(attn_chain, K, V, q, bias) / REPS
        ms_step = timed(steps, K, V, tok, pmask, T) / REPS
        kv_bytes = 2 * K.size * K.dtype.itemsize  # K+V read once per token
        print(json.dumps({
            "T": T, "batch": batch,
            "ms_stream": round(ms_stream, 3),
            "ms_attn": round(ms_attn, 3),
            "ms_step": round(ms_step, 3),
            "stream_GBps": round(kv_bytes / (ms_stream * 1e-3) / 1e9, 1),
            "attn_GBps_equiv": round(kv_bytes / (ms_attn * 1e-3) / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
