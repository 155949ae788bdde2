"""Decompose the PACKED cold-path generate program (round 4).

The packed prefill (models/qwen2.py prefill_packed) landed with a measured
REGRESSION vs the padded path it replaces on squad_real/noprefix: proxy
281.4 -> 437.7 ms/batch, despite doing ~0.58x the prefill tokens. This
script attributes the gap on the real chip:

  A. padded  generate mnt=1 / mnt=10 at (B=32, P=448)   [the old path]
  B. packed  generate mnt=1 / mnt=10 at (T=sum lens, P=512)
  C. flash_attention (padded) vs flash_attention_packed kernels alone
  D. packed prefill with the KV unpack-gather isolated

Method: N same-shape dispatches queued back-to-back, one sync.
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
from rag_serving_system_tpu.models.qwen2 import generate, generate_packed
from rag_serving_system_tpu.ops.attention import (flash_attention,
                                                  flash_attention_packed)
from rag_serving_system_tpu.ops.quant import quantize_decoder_params

B = int(os.environ.get("B", "32"))
P_PAD = int(os.environ.get("P_PAD", "448"))
P_PACK = int(os.environ.get("P_PACK", "512"))
REPS = int(os.environ.get("REPS", "4"))
LEN_MEAN = float(os.environ.get("LEN_MEAN", "260"))
LEN_STD = float(os.environ.get("LEN_STD", "60"))


def timed(label, fn, reps=REPS):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / reps
    print(f"{label:52s} {dt*1e3:8.1f} ms/call", flush=True)
    return dt


def pack_layout(lens, p, t, pad_id=0):
    """Replicates engine._stage_packed host layout."""
    b = len(lens)
    rng = np.random.default_rng(0)
    stream = np.zeros((3, t), dtype=np.int32)
    stream[0] = pad_id
    stream[1] = b
    gather = np.full((b, p), -1, dtype=np.int32)
    last = np.full((b,), -1, dtype=np.int32)
    off = 0
    for i, ln in enumerate(lens):
        stream[0, off:off + ln] = rng.integers(10, 1000, ln)
        stream[1, off:off + ln] = i
        stream[2, off:off + ln] = np.arange(ln)
        gather[i, p - ln:] = off + np.arange(ln)
        last[i] = off + ln - 1
        off += ln
    return stream, gather, last


def main():
    print(f"backend={jax.default_backend()}  B={B} P_PAD={P_PAD} "
          f"P_PACK={P_PACK}")
    cfg = decoder_config_for("full")
    params = init_decoder_params(cfg, 0, jnp.bfloat16)
    params_q = quantize_decoder_params(params, bits=8)
    rng = jax.random.PRNGKey(1)

    # squad_real-like length draw: mean ~260, max < P_PACK
    lens = np.clip(np.random.default_rng(1).normal(LEN_MEAN, LEN_STD, B).astype(int),
                   150, P_PACK - 16)
    total = int(lens.sum())
    t = -(-total // 1024) * 1024
    print(f"row lens mean={lens.mean():.0f} sum={total} -> T bucket {t} "
          f"(padded total {B * P_PAD})")

    stream, gather, last = pack_layout(lens, P_PACK, t)
    stream_d = jnp.asarray(stream)
    seg = stream_d[1][None]
    pos = stream_d[2][None]
    ids_pk = stream_d[0][None]
    gather_d = jnp.asarray(np.maximum(gather, 0))
    pmask = jnp.asarray((gather >= 0).astype(np.int32))
    last_d = jnp.asarray(last)
    rv = jnp.ones((B,), bool)

    ids_pad = jnp.asarray(
        np.random.default_rng(2).integers(10, 1000, (B, P_PAD)), jnp.int32)
    mask_pad = jnp.ones((B, P_PAD), jnp.int32)

    # --- kernels alone -------------------------------------------------
    hq, hk, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    kq = jax.random.normal(rng, (B, P_PAD, hq, d), jnp.bfloat16)
    kk = jax.random.normal(rng, (B, P_PAD, hk, d), jnp.bfloat16)
    # kernel-alone comparison at 512 (448 is not a 128-multiple: the engine's
    # 448 bucket runs the einsum attention, see _flash_config)
    kq5 = jax.random.normal(rng, (B, 512, hq, d), jnp.bfloat16)
    kk5 = jax.random.normal(rng, (B, 512, hk, d), jnp.bfloat16)
    m5 = jnp.ones((B, 512), jnp.int32)
    timed("kernel: flash padded (B,512)",
          lambda: flash_attention(kq5, kk5, kk5, m5, causal=True))
    pq = jax.random.normal(rng, (1, t, hq, d), jnp.bfloat16)
    pk = jax.random.normal(rng, (1, t, hk, d), jnp.bfloat16)
    timed("kernel: flash packed (1,T)",
          lambda: flash_attention_packed(pq, pk, pk, seg,
                                         max_seg_len=P_PACK))

    # --- end-to-end generate -------------------------------------------
    for label, mnt in (("padded W8A8 mnt=1 (prefill)", 1),
                       ("padded W8A8 mnt=10", 10)):
        timed(label, lambda mnt=mnt: generate(
            params_q, cfg, ids_pad, mask_pad, rng, max_new_tokens=mnt,
            do_sample=True, dtype=jnp.bfloat16, row_valid=rv, act_quant=True))

    for label, mnt, aq in (("packed W8A8 mnt=1 (prefill)", 1, True),
                           ("packed W8A8 mnt=10", 10, True),
                           ("packed W8-only mnt=1", 1, False)):
        timed(label, lambda mnt=mnt, aq=aq: generate_packed(
            params_q, cfg, ids_pk, seg, pos, last_d, gather_d, pmask, rng,
            max_new_tokens=mnt, max_seg_len=P_PACK, do_sample=True,
            dtype=jnp.bfloat16, row_valid=rv, act_quant=aq))


if __name__ == "__main__":
    main()
