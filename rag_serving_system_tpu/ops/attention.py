"""Pallas flash attention for TPU (prefill path).

Online-softmax block attention: for each query block the kernel streams key/
value blocks through VMEM keeping running (max, sum, acc) statistics — the
(S, S) score matrix never exists in HBM, unlike the XLA einsum path that
materializes (B, H, S, S) f32. Supports:

- causal masking with left-padded prompts ((B, S) {0,1} mask)
- non-causal (encoder) mode with the same padding mask
- GQA: query head h attends through kv head h // (Hq // Hk); kv heads are
  never materialized repeated
- causal block skipping: key blocks strictly above the diagonal are not read

Kernel layout: (B, H, S, D) so Mosaic tiles are (blk_q, head_dim) — the
last two dims must be (8, 128)-aligned. The public wrapper takes the model's
(B, S, H, D) layout and transposes (XLA fuses the transpose into the
producing matmul).

Used by the decoder prefill for long prompt buckets (the (B,H,S,S) XLA
buffer at S=1024, B=32 is 1.5 GB of HBM traffic; flash streams it); the
einsum path in models/layers.py remains the small-S / CPU fallback and the
correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                  *, blk_q, blk_k, seq_k, causal, sm_scale):
    # q_ref: (1, 1, BLK_Q, D); k_ref/v_ref: (1, 1, S, D); mask_ref: (B, S)
    bi = pl.program_id(0)
    iq = pl.program_id(2)
    d = q_ref.shape[-1]
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale             # (BLK_Q, D)

    n_kblocks = pl.cdiv(seq_k, blk_k)
    if causal:
        # highest key block the last row of this q block can see
        # (iq is traced → compute the bound as a traced value)
        n_kblocks = jnp.minimum(
            n_kblocks, ((iq + 1) * blk_q + blk_k - 1) // blk_k)

    row_ids = iq * blk_q + jax.lax.broadcasted_iota(
        jnp.int32, (blk_q, blk_k), 0)

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (BLK_Q, BLK_K)
        col_ids = j * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1)
        valid = mask_ref[bi, pl.ds(j * blk_k, blk_k)][None, :] > 0
        if causal:
            valid = valid & (col_ids <= row_ids)
        s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)               # (BLK_Q, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                  # (BLK_Q, BLK_K)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kblocks, body, (m0, l0, acc0))

    # fully-masked rows: every score stayed NEG_INF, so m == NEG_INF and
    # p = exp(0) = 1 made (l, acc) an average-of-V — emit zeros for those
    # rows instead so the output contract holds for any caller
    out = acc / jnp.maximum(l, 1e-30)
    out = jnp.where(m > NEG_INF / 2, out, 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "blk_q", "blk_k", "interpret"))
def flash_attention(
    q: jax.Array,          # (B, S, Hq, D)
    k: jax.Array,          # (B, S, Hk, D)
    v: jax.Array,          # (B, S, Hk, D)
    mask: jax.Array,       # (B, S) {0,1} — key-side padding mask
    causal: bool = True,
    blk_q: int = 256,
    blk_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, s, hq, d = q.shape
    hk = k.shape[2]
    group = hq // hk
    blk_q = min(blk_q, s)
    blk_k = min(blk_k, s)
    if s % blk_q or s % blk_k:
        raise ValueError(f"seq {s} must be a multiple of block sizes "
                         f"({blk_q}, {blk_k}); pad the bucket")
    sm_scale = 1.0 / (d ** 0.5)

    qt = jnp.transpose(q, (0, 2, 1, 3))   # (B, Hq, S, D)
    kt = jnp.transpose(k, (0, 2, 1, 3))   # (B, Hk, S, D)
    vt = jnp.transpose(v, (0, 2, 1, 3))

    kernel = functools.partial(
        _flash_kernel, blk_q=blk_q, blk_k=blk_k, seq_k=s,
        causal=causal, sm_scale=sm_scale)

    grid = (b, hq, s // blk_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # mask: full array resident (small); row-indexed inside the kernel
            pl.BlockSpec((b, s), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi // group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * s * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * hq * s * s,
        ),
        interpret=interpret,
    )(mask.astype(jnp.int32), qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))
