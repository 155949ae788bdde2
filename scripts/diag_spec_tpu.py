"""Bisection diagnostic for the full-size spec-decode divergence on TPU.

Observed (profile_spec_decode.py): tiny/f32/P=32 matches exactly ON TPU,
but full-size diverges from column 0 even at f32 and even oracle drafts
never accept. Candidate culprits, isolated here:

  A. prefill cache-alloc padding (64 vs 66) changing logits0
  B. decode_step_spec at S=1 vs decode_step (scatter-write + banded bias
     vs aligned dynamic_update_slice + slot bias)
  C. decode_step_spec at S=3 fed the TRUE next tokens vs three sequential
     decode_steps (the multi-position verify forward itself)

Usage: [TINY=1] [PROMPT=512] [DTYPE=float32] python scripts/diag_spec_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rag_serving_system_tpu.models.configs import QWEN25_15B, QWEN2_TINY
from rag_serving_system_tpu.models.qwen2 import (KVCache, decode_step,
                                                 decode_step_spec, prefill)
from rag_serving_system_tpu.models.weights import init_decoder_params

TINY = os.environ.get("TINY") == "1"
B = int(os.environ.get("BATCH", "8"))
P = int(os.environ.get("PROMPT", "512"))
MNT = 8
DTYPE = {"float32": jnp.float32,
         "bfloat16": jnp.bfloat16}[os.environ.get("DTYPE", "float32")]


def report(tag, a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    d = np.abs(a - b)
    am, bm = a.argmax(-1), b.argmax(-1)
    print(f"{tag}: max|Δ|={d.max():.3e} mean|Δ|={d.mean():.3e} "
          f"argmax_equal={(am == bm).all()} "
          f"argmax_mismatch_rows={(am != bm).sum()}")


def main() -> None:
    cfg = QWEN2_TINY if TINY else QWEN25_15B
    params = init_decoder_params(cfg, dtype=DTYPE)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, cfg.vocab_size - 10, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), jnp.int32)
    print(f"backend={jax.default_backend()} tiny={TINY} B={B} P={P} "
          f"dtype={DTYPE.__name__}")

    # A: alloc padding
    l64, c64 = prefill(params, cfg, ids, mask, MNT, dtype=DTYPE)
    l66, c66 = prefill(params, cfg, ids, mask, MNT + 2, dtype=DTYPE)
    report("A prefill logits0 alloc+0 vs alloc+2", l64, l66)

    tok0 = jnp.argmax(l64, axis=-1).astype(jnp.int32)

    # B: S=1 spec step vs decode_step on the SAME cache
    lg_seq, _ = decode_step(params, cfg, c64, tok0, jnp.int32(0), P, mask,
                            dtype=DTYPE)
    lg_spec, _ = decode_step_spec(params, cfg, c66, tok0[:, None],
                                  jnp.zeros((B,), jnp.int32), P, mask,
                                  dtype=DTYPE)
    report("B decode_step vs decode_step_spec(S=1)", lg_seq, lg_spec[:, 0])

    # C: sequential 3 steps vs one S=3 verify chunk fed the true tokens
    cache = c64
    toks = [tok0]
    logits_seq = []
    for step in range(3):
        lg, cache = decode_step(params, cfg, cache, toks[-1],
                                jnp.int32(step), P, mask, dtype=DTYPE)
        logits_seq.append(lg)
        toks.append(jnp.argmax(lg, axis=-1).astype(jnp.int32))
    chunk = jnp.stack(toks[:3], axis=1)            # (B, 3) true tokens
    lg_chunk, _ = decode_step_spec(params, cfg, c66, chunk,
                                   jnp.zeros((B,), jnp.int32), P, mask,
                                   dtype=DTYPE)
    for j in range(3):
        report(f"C position {j} (seq step vs chunk)", logits_seq[j],
               lg_chunk[:, j])


def loop_diag() -> None:
    """D: the full _spec_decode_loop vs sequential generate, oracle drafts."""
    from rag_serving_system_tpu.models.qwen2 import _spec_decode_loop, generate

    cfg = QWEN2_TINY if TINY else QWEN25_15B
    params = init_decoder_params(cfg, dtype=DTYPE)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, cfg.vocab_size - 10, (B, P)), jnp.int32)
    mask = jnp.ones((B, P), jnp.int32)
    base = np.asarray(generate(params, cfg, ids, mask, jax.random.PRNGKey(0),
                               max_new_tokens=MNT, do_sample=False,
                               dtype=DTYPE))
    for gamma in (4,):
        l0, cache = prefill(params, cfg, ids, mask, MNT + gamma, dtype=DTYPE)
        out, iters = _spec_decode_loop(
            params, cfg, l0, cache, mask, MNT, gamma, DTYPE, None, P, ids,
            draft_source=jnp.asarray(base))
        out = np.asarray(out)
        neq = out != base
        rows = neq.any(axis=1)
        print(f"D loop gamma={gamma}: iters={int(iters)} "
              f"diverging_rows={rows.sum()}/{B}")
        for r in np.where(rows)[0][:4]:
            c = int(np.argmax(neq[r]))
            print(f"   row {r}: first_div_col={c} "
                  f"base={base[r, max(0,c-1):c+3].tolist()} "
                  f"spec={out[r, max(0,c-1):c+3].tolist()}")


if __name__ == "__main__":
    if os.environ.get("LOOP_DIAG") == "1":
        loop_diag()
    else:
        main()
