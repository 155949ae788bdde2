"""Pallas flash attention for TPU (prefill path).

Online-softmax block attention: for each query block the kernel streams key/
value blocks through VMEM keeping running (max, sum, acc) statistics — the
(S, S) score matrix never exists in HBM, unlike the XLA einsum path that
materializes (B, H, S, S) f32. Supports:

- causal masking with left-padded prompts ((B, S) {0,1} mask)
- non-causal (encoder) mode with the same padding mask
- GQA: query head h attends through kv head h // (Hq // Hk); kv heads are
  never materialized repeated
- causal block skipping: key blocks strictly above the diagonal do no work
- any sequence that is a multiple of 128 (block size drops to 128 off the
  256-multiples), so finer prompt buckets like 384/640 stay on this path

Kernel layout: the grid is (batch, q-head, q-block, K-BLOCK) with the key
block as the innermost (sequential) axis; the running (m, l, acc) statistics
live in VMEM scratch that persists across the k-steps of one q-block. The
padding mask arrives as a grid-indexed (1, blk_k) block — no dynamic loads
inside the kernel (Mosaic rejects 128-strided dynamic slices on this
target). The public wrapper takes the model's (B, S, H, D) layout and
transposes (XLA fuses the transpose into the producing matmul).

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


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, blk_q, blk_k, causal, sm_scale):
    # grid: (b, hq, q-block, k-block); k-block is innermost/sequential, the
    # (m, l, acc) scratch carries across it
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal: skip key blocks strictly above this q block's diagonal
    compute = (ki * blk_k <= (qi + 1) * blk_q - 1) if causal else (ki >= 0)

    @pl.when(compute)
    def _block():
        q = q_ref[0, 0].astype(jnp.float32) * sm_scale          # (BLK_Q, D)
        k_blk = k_ref[0, 0].astype(jnp.float32)                 # (BLK_K, D)
        v_blk = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (BLK_Q, BLK_K)
        # this batch row's mask tile: dynamic SUBLANE pick is supported
        # (dynamic lane slices are not — hence the grid-indexed k tile)
        valid = mask_ref[pl.ds(bi, 1), :] > 0                   # (1, BLK_K)
        if causal:
            row_ids = qi * blk_q + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 0)
            col_ids = ki * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1)
            valid = valid & (col_ids <= row_ids)
        s = jnp.where(valid, s, NEG_INF)

        m_prev, l_prev, acc = m_scr[:], l_scr[:], acc_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)               # (BLK_Q, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                  # (BLK_Q, BLK_K)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[:] = m_new
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _emit():
        # fully-masked rows: every score stayed NEG_INF, so m == NEG_INF and
        # p = exp(0) = 1 made (l, acc) an average of V — emit zeros for those
        # rows instead so the output contract holds for any caller
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        out = jnp.where(m_scr[:] > NEG_INF / 2, out, 0.0)
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
        _flash_kernel, blk_q=blk_q, blk_k=blk_k,
        causal=causal, sm_scale=sm_scale)

    # causal: clamp the K/V (and mask) block index at this q-block's
    # diagonal. Key blocks strictly above it are skipped by the kernel's
    # pl.when — but WITHOUT the clamp their DMAs still run (the pipeline
    # fetches whatever the index map names). A clamped (repeated) index is
    # recognized by the pipeline as "block unchanged" and the copy is
    # elided, saving ~(nk-1)/2nk of all K/V HBM traffic (the standard JAX
    # TPU flash-kernel trick).
    def ki_eff(qi, ki):
        if not causal:
            return ki
        return jnp.minimum(ki, ((qi + 1) * blk_q - 1) // blk_k)

    grid = (b, hq, s // blk_q, s // blk_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # padding mask: (B, blk_k) tile per key block (full batch dim —
            # (1, blk_k) violates the sublane tiling minimum); the kernel
            # picks its row by program id
            pl.BlockSpec((b, blk_k), lambda bi, hi, qi, ki: (0, ki_eff(qi, ki)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki_eff(qi, ki), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d),
                         lambda bi, hi, qi, ki: (bi, hi // group, ki_eff(qi, ki), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, d),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * s * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * hq * s * s,
        ),
        interpret=interpret,
    )(mask.astype(jnp.int32), qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))
