"""Weight-only int8 quantization (opt-in, QUANT_WEIGHTS=int8).

Decode steps are weight-bandwidth-bound: every generated token re-reads all
decoder weights from HBM (~3.1 GB in bf16 for Qwen2.5-1.5B). Per-output-
channel symmetric int8 halves those bytes; the dequant (convert + scale)
fuses into the matmul operand load on TPU, so no bf16 weight copy is ever
materialized in HBM.

Representation: a `QuantizedWeight(q, scale)` pytree node wherever a 2-D
dense weight lived; `models.layers.dense` accepts either a plain array or a
QuantizedWeight. Embeddings/norms/biases stay bf16 (gathers don't benefit
and norms are precision-sensitive).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QuantizedWeight(NamedTuple):
    q: jax.Array        # (in, out) int8
    scale: jax.Array    # (1, out) f32 — per-output-channel


WeightLike = Union[jax.Array, QuantizedWeight]


def quantize_int8(w: jax.Array) -> QuantizedWeight:
    """Per-output-channel symmetric quantization of an (in, out) weight."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)          # (1, out)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q=q, scale=scale)


def dequantize(qw: QuantizedWeight, dtype=jnp.bfloat16) -> jax.Array:
    return (qw.q.astype(jnp.float32) * qw.scale).astype(dtype)


def quantize_act_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-row (per-token) symmetric int8 quantization of an
    activation tensor (..., d). Returns (int8 values, (..., 1) f32 scales).

    Used by the W8A8 prefill path: int8 activations against the already-int8
    weights hit the MXU's int8 mode (~1.45x bf16 throughput on v5e through
    XLA). Per-token scales keep the quantization error ~0.3% relative — the
    scale is an exact power-free f32, and |x| <= 127 rounds once."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows_int8(w: jax.Array) -> QuantizedWeight:
    """Per-ROW symmetric quantization — for (V, H) embedding / tied LM-head
    matrices, one scale per vocabulary row."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)          # (V, 1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q=q, scale=scale)


def quantize_decoder_params(params: dict) -> dict:
    """Quantize every 2-D matmul weight in a decoder pytree, plus the (tied)
    token-embedding matrix — the LM head re-reads it every decode step, so
    it is the single largest weight stream. Norms and biases stay bf16.
    Returns a new pytree with QuantizedWeight leaves (same key names, so TP
    sharding rules still apply to `.q`)."""
    quant_keys = {"qkv_w", "o_w", "gu_w", "down_w", "ff_w1", "ff_w2", "lm_head"}

    def walk(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "embed" and getattr(v, "ndim", 0) == 2:
                    out[k] = quantize_rows_int8(v)
                elif k in quant_keys and getattr(v, "ndim", 0) == 2:
                    out[k] = quantize_int8(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(tree, list):
            return [walk(v) for v in tree]
        return tree

    return walk(params)
