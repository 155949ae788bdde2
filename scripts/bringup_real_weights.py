"""Real-checkpoint bring-up runbook (VERDICT r2 #7): one command that takes
local HF snapshots of the serving models to a VERIFIED serving engine.

Given WEIGHTS_DIR containing snapshots of the encoder
(intfloat/multilingual-e5-large-instruct) and decoder
(Qwen/Qwen2.5-1.5B-Instruct) — the layout `find_snapshot` probes, e.g.
`$WEIGHTS_DIR/intfloat--multilingual-e5-large-instruct/*.safetensors` or an
HF hub cache — this script verifies, in order:

  1. WEIGHT LOADING — both checkpoints map onto the JAX pytrees and the
     engine reports hf (not random-init) weights.
  2. EMBEDDING PARITY — our encoder's passage embeddings for the first N
     real SQuAD contexts match the reference's committed e5 embeddings
     (data/squad_real_embeddings.npy, built with torch by the reference's
     scripts/squad_dataset.py): cosine > 0.999 per row.
  3. RETRIEVAL — recall@5 of our query embeddings against the corpus equals
     the reference's exact search (and the query→own-context recall is
     printed for eyeballing).
  4. LIVE SERVE — one engine.process() batch end-to-end with the real
     tokenizer, printing the generated answers + timings.

Offline CI cover: tests/test_hf_integration.py runs the same seams against
tiny-but-real checkpoints built in-test; this script is the full-size field
procedure (needs downloaded weights, so it cannot run in the build sandbox).

Usage:
  WEIGHTS_DIR=/path/to/snapshots python scripts/bringup_real_weights.py \
      [--n-docs 64] [--skip-generate]
Exits non-zero on any failed check.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(f"[bringup] {msg}", flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--weights-dir", default=os.environ.get("WEIGHTS_DIR"))
    p.add_argument("--n-docs", type=int, default=64,
                   help="SQuAD contexts to embed for the parity check")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--cos-threshold", type=float, default=0.999)
    p.add_argument("--skip-generate", action="store_true")
    # data overrides (defaults: the repo's real SQuAD import) — lets the
    # offline test (tests/test_hf_integration.py) run this exact runbook
    # against tiny in-test checkpoints + a tiny torch-built corpus
    p.add_argument("--contexts", default=None)
    p.add_argument("--embeddings", default=None)
    p.add_argument("--queries", default=None)
    p.add_argument("--recall-min", type=float, default=0.9)
    args = p.parse_args()
    if not args.weights_dir:
        p.error("--weights-dir or WEIGHTS_DIR required")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    # honor an explicit JAX_PLATFORMS=cpu even under device plugins that
    # force-select themselves (env alone loses to the plugin; the config
    # update wins) — without this, CI runs of the runbook hang whenever the
    # accelerator is unreachable
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "cpu" in want.split(","):
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass

    from rag_serving_system_tpu.config import Settings
    from rag_serving_system_tpu.core.engine import QUERY_PREFIX, RagEngine
    from rag_serving_system_tpu.models.e5 import encode
    from rag_serving_system_tpu.models.tokenizer import pad_and_stack

    # ---- real SQuAD artifacts (repo-local import; see data/README.md) ----
    data_dir = os.path.join(REPO, "data")
    ctx_path = args.contexts or os.path.join(data_dir, "squad_real_contexts.json")
    emb_path = args.embeddings or os.path.join(data_dir, "squad_real_embeddings.npy")
    q_path = args.queries or os.path.join(data_dir, "squad_real_queries.json")
    if not os.path.exists(ctx_path):
        log("FATAL: data/squad_real_* artifacts missing")
        return 2
    with open(ctx_path) as f:
        contexts = json.load(f)
    ref_emb = np.load(emb_path).astype(np.float32)           # (N, H)
    with open(q_path) as f:
        queries = json.load(f)

    # ---- 1. engine with real weights ----
    settings = Settings(model_preset="full",
                        weights_dir=args.weights_dir,
                        batch_buckets=[8], max_batch_size=8,
                        encode_len_buckets=[64, 128, 512],
                        prompt_len_buckets=[448, 640, 1024],
                        max_new_tokens=10, max_k=args.k, do_sample=False)
    t0 = time.time()
    engine = RagEngine(settings, contexts, ref_emb)
    log(f"engine up in {time.time() - t0:.1f}s")
    from rag_serving_system_tpu.models.weights import find_snapshot
    for name in (settings.embed_model_name, settings.llm_model_name):
        snap = find_snapshot(args.weights_dir, name)
        if not snap:
            log(f"FATAL: no snapshot for {name} under {args.weights_dir}")
            return 2
        log(f"snapshot ok: {name} -> {snap}")
    from rag_serving_system_tpu.models.tokenizer import HashTokenizer
    if isinstance(engine.enc_tok, HashTokenizer) or isinstance(
            engine.dec_tok, HashTokenizer):
        log("FATAL: engine fell back to HashTokenizer — weights/tokenizer "
            "artifacts not found; check WEIGHTS_DIR layout")
        return 2

    # ---- 2. embedding parity vs the reference's committed e5 vectors ----
    n = min(args.n_docs, len(contexts))
    log(f"embedding {n} real contexts for parity "
        f"(reference recipe: 'passage: ' prefix, mean pool, L2 norm)")
    ours = []
    # the reference embeds UNMASKED-mean over per-batch padded width
    # (squad_dataset.py:104-121: batch_size=32, padding=True, max_length=512)
    # — so batch composition matters; replicate batches of 32 in file order
    bs = 32
    for i in range(0, n, bs):
        chunk = ["passage: " + c for c in contexts[i:i + bs]]
        rows = [engine.enc_tok.encode(t)[:512] for t in chunk]
        width = max(len(r) for r in rows)
        ids, mask = pad_and_stack(rows, width, engine.enc_tok.pad_id,
                                  pad_side="right")
        emb = encode(engine.enc_params, engine.enc_cfg, jnp.asarray(ids),
                     jnp.asarray(mask), pooling="mean_all",
                     dtype=engine.dtype)
        ours.append(np.asarray(emb, dtype=np.float32))
    ours = np.concatenate(ours)[:n]
    ours /= np.linalg.norm(ours, axis=1, keepdims=True) + 1e-12
    ref_n = ref_emb[:n] / (np.linalg.norm(ref_emb[:n], axis=1,
                                          keepdims=True) + 1e-12)
    cos = np.sum(ours * ref_n, axis=1)
    log(f"embedding cosine vs reference: min={cos.min():.5f} "
        f"mean={cos.mean():.5f}")
    emb_ok = bool(cos.min() > args.cos_threshold)
    if not emb_ok:
        worst = int(np.argmin(cos))
        log(f"WORST row {worst}: cos={cos[worst]:.5f} — bf16 compute gives "
            f"~1e-3 spread; rerun with COMPUTE_DTYPE=float32 to separate "
            f"dtype noise from a porting bug")

    # ---- 3. retrieval recall vs the reference's exact search ----
    nq = min(64, len(queries))
    q_idx = engine.embed_and_retrieve(queries[:nq], [args.k] * nq)
    # reference-search parity with arbitrary query embeddings is pinned by
    # scripts/reference_parity.py; here check the end metric: recall@k of
    # query i's own context (pairs are aligned by construction)
    hit = sum(1 for i, row in enumerate(q_idx) if i in row)
    log(f"recall@{args.k} (query->own context): {hit}/{nq} = {hit / nq:.3f}")
    rec_ok = hit / nq >= args.recall_min

    # ---- 4. one live generate batch ----
    gen_ok = True
    if not args.skip_generate:
        t0 = time.time()
        results = engine.process(queries[:8], [2] * 8)
        dt = time.time() - t0
        log(f"first live batch (incl. compile): {dt:.1f}s")
        for q, r in list(zip(queries[:8], results))[:3]:
            log(f"  Q: {q[:60]!r} -> A: {r['result'][:80]!r}")
        t0 = time.time()
        engine.process(queries[:8], [2] * 8)
        log(f"warm batch: {time.time() - t0:.2f}s")
        gen_ok = all(isinstance(r.get("result"), str) for r in results)

    ok = emb_ok and rec_ok and gen_ok
    print(json.dumps({"embedding_cos_min": float(cos.min()),
                      "embedding_parity": emb_ok,
                      f"recall@{args.k}": hit / nq,
                      "recall_ok": rec_ok,
                      "generate_ok": gen_ok,
                      "pass": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
