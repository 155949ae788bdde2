"""Raw MXU roofline probe: bf16 vs int8xint8->int32 dot at prefill shapes.

The cold-path prefill (VERDICT r3 #1) measures at ~bf16 roofline despite
W8A8 being enabled; this isolates whether XLA's int8 dot actually runs at
the MXU's 2x int8 rate on this chip, and what the dynamic activation-quant
overhead costs.
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

M = int(os.environ.get("M", "16384"))   # total prefill tokens (B*P)
K = int(os.environ.get("K", "1536"))
N = int(os.environ.get("N", "8960"))    # qwen2.5-1.5b ffn dim
REPS = int(os.environ.get("REPS", "20"))


def timed(label, fn, flops):
    # np.asarray on the (scalar-reduced) output is the only real sync over
    # the axon tunnel — block_until_ready returns early there
    np.asarray(fn())
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    np.asarray(out)
    dt = (time.time() - t0) / REPS
    print(f"{label:44s} {dt*1e3:7.2f} ms  {flops/dt/1e12:7.1f} TFLOP/s",
          flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} M={M} K={K} N={N}")
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.normal(size=(1, N)), jnp.float32)
    flops = 2.0 * M * K * N

    @jax.jit
    def dot_bf16(x, w):
        return jax.lax.dot(x, w, preferred_element_type=jnp.float32).sum()

    @jax.jit
    def dot_bf16_bf16acc(x, w):
        return jax.lax.dot(x, w, preferred_element_type=jnp.bfloat16).astype(jnp.float32).sum()

    @jax.jit
    def dot_i8(x, w):
        return jax.lax.dot(x, w, preferred_element_type=jnp.int32).sum()

    @jax.jit
    def dot_w8_bf16act(x, w, s):
        # weight-only int8: int8 weight cast to bf16 on load
        return (jax.lax.dot(x, w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * s).sum()

    from rag_serving_system_tpu.ops.quant import quantize_act_int8

    @jax.jit
    def w8a8_full(x, w, s):
        xq, xs = quantize_act_int8(x)
        acc = jax.lax.dot(xq, w, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * s).sum()

    timed("bf16 x bf16 -> f32", lambda: dot_bf16(xb, wb), flops)
    timed("bf16 x bf16 -> bf16", lambda: dot_bf16_bf16acc(xb, wb), flops)
    timed("int8 x int8 -> int32", lambda: dot_i8(xi, wi), flops)
    timed("w8 (bf16 act, int8 weight cast)",
          lambda: dot_w8_bf16act(xb, wi, ws), flops)
    timed("w8a8 full (quantize_act + dot + rescale)",
          lambda: w8a8_full(xb, wi, ws), flops)


if __name__ == "__main__":
    main()
