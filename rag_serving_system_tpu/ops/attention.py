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


def _flash_packed_kernel(qstart_ref, segq_ref, segk_ref, q_ref, k_ref, v_ref,
                         o_ref, m_scr, l_scr, acc_scr, *, blk_q, blk_k,
                         sm_scale, n_bands):
    """Packed (ragged-batch) causal attention: one (1, T) token stream holding
    B variable-length sequences back-to-back, segment ids marking row
    boundaries. The grid's innermost axis is a BAND of k-blocks starting at
    this q-block's earliest segment start (scalar-prefetched `qstart`) and
    ending at the causal diagonal — k-blocks outside a segment's reach are
    never visited, so the work is proportional to sum(len_b^2), not T^2."""
    qi = pl.program_id(1)
    bi = pl.program_id(2)                   # band step
    ki = qstart_ref[qi] + bi                # logical k-block index
    diag = ((qi + 1) * blk_q - 1) // blk_k

    @pl.when(bi == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(ki <= diag)
    def _block():
        q = q_ref[0].astype(jnp.float32) * sm_scale             # (BLK_Q, D)
        k_blk = k_ref[0].astype(jnp.float32)                    # (BLK_K, D)
        v_blk = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (BLK_Q, BLK_K)
        seg_q = segq_ref[0, :]                                  # (BLK_Q,)
        seg_k = segk_ref[0, :]                                  # (BLK_K,)
        row_ids = qi * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 0)
        col_ids = ki * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1)
        valid = (seg_q[:, None] == seg_k[None, :]) & (col_ids <= row_ids)
        s = jnp.where(valid, s, NEG_INF)

        m_prev, l_prev, acc = m_scr[:], l_scr[:], acc_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[:] = m_new
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(bi == n_bands - 1)
    def _emit():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
        out = jnp.where(m_scr[:] > NEG_INF / 2, out, 0.0)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("max_seg_len", "blk_q", "blk_k", "interpret"))
def flash_attention_packed(
    q: jax.Array,          # (1, T, Hq, D) packed token stream
    k: jax.Array,          # (1, T, Hk, D)
    v: jax.Array,          # (1, T, Hk, D)
    seg: jax.Array,        # (1, T) int32 ascending segment ids; pads = large
    max_seg_len: int,      # static bound on any segment's length
    blk_q: int = 256,
    blk_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Causal attention over a packed stream: token i attends to token j iff
    seg[i] == seg[j] and j <= i. With contiguous ascending segments this is
    exactly per-row causal attention — the packed equivalent of
    `flash_attention` over a padded (B, S) batch, at sum(len_b) cost.

    `seg` MUST be ascending (rows packed back-to-back, pad tokens at the
    tail with a segment id larger than any row's). Work per q-block is a
    static band of ceil((max_seg_len + blk_q)/blk_k) + 1 k-blocks anchored
    at the block's earliest segment start, so total work scales with
    sum(len_b * max_seg_len-ish block granularity), never T^2."""
    _, t, hq, d = q.shape
    hk = k.shape[2]
    group = hq // hk
    blk_q = min(blk_q, t)
    blk_k = min(blk_k, t)
    if t % blk_q or t % blk_k:
        raise ValueError(f"packed length {t} must be a multiple of block "
                         f"sizes ({blk_q}, {blk_k}); pad the bucket")
    sm_scale = 1.0 / (d ** 0.5)
    nq = t // blk_q
    n_bands = -(-(max_seg_len + blk_q) // blk_k) + 1

    seg_t = seg[0]
    # first k-block each q-block needs: the block holding the segment start
    # of the q-block's first token (segments ascend, so that is the earliest)
    qstart = (jnp.searchsorted(seg_t, seg_t[::blk_q], side="left")
              // blk_k).astype(jnp.int32)

    qt = jnp.transpose(q, (2, 1, 3, 0))[..., 0]   # (Hq, T, D)
    kt = jnp.transpose(k, (2, 1, 3, 0))[..., 0]   # (Hk, T, D)
    vt = jnp.transpose(v, (2, 1, 3, 0))[..., 0]
    # (1, blk) tiles violate the sublane minimum — replicate seg to 8 rows
    seg8 = jnp.broadcast_to(seg_t[None, :], (8, t)).astype(jnp.int32)

    kernel = functools.partial(
        _flash_packed_kernel, blk_q=blk_q, blk_k=blk_k,
        sm_scale=sm_scale, n_bands=n_bands)

    nk = t // blk_k

    def ki_eff(hi, qi, bi, qstart_ref):
        # clamp band steps past the diagonal onto the diagonal block: the
        # pipeline recognizes the repeated index and elides the copy
        diag = ((qi + 1) * blk_q - 1) // blk_k
        return jnp.clip(qstart_ref[qi] + bi, 0, jnp.minimum(diag, nk - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hq, nq, n_bands),
        in_specs=[
            pl.BlockSpec((8, blk_q), lambda hi, qi, bi, qs: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk_k),
                         lambda hi, qi, bi, qs: (0, ki_eff(hi, qi, bi, qs)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, d), lambda hi, qi, bi, qs: (hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d),
                         lambda hi, qi, bi, qs: (hi // group,
                                                 ki_eff(hi, qi, bi, qs), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d),
                         lambda hi, qi, bi, qs: (hi // group,
                                                 ki_eff(hi, qi, bi, qs), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d),
                               lambda hi, qi, bi, qs: (hi, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hq, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * hq * t * max_seg_len * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=hq * t * max_seg_len,
        ),
        interpret=interpret,
    )(qstart, seg8, seg8, qt, kt, vt)
    return jnp.transpose(out, (1, 0, 2))[None]    # (1, T, Hq, D)


def packed_attention_reference(q, k, v, seg):
    """jnp oracle for flash_attention_packed (and the small-T/CPU fallback):
    block-diagonal causal bias from segment ids. O(T^2) memory — fine for
    tests and small packed buckets only."""
    from rag_serving_system_tpu.models.layers import attention

    t = q.shape[1]
    col = jnp.arange(t)
    valid = (seg[0][:, None] == seg[0][None, :]) & (col[None, :] <= col[:, None])
    bias = jnp.where(valid, 0.0, NEG_INF)[None, None].astype(jnp.float32)
    return attention(q, k, v, bias)


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
