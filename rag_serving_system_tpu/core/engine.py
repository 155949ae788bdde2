"""The RAG serving engine: embed → retrieve → generate, TPU-resident.

Replaces the reference's three-stage torch/CuPy/HF-pipeline batch path
(reference: rag_service/core/batch_processor.py:74-113) with two jit-compiled
XLA programs per shape bucket:

  1. `embed+retrieve` — encoder forward, mean-pool, L2-normalized cosine
     top-k against the device-resident corpus. Query embeddings never leave
     the device; only the (B, max_k) index matrix comes to host.
  2. `generate` — prefill + KV-cached lax.scan decode, sampling on device.

Between the two, the host looks up document text and re-tokenizes prompts
(inherently host work — same boundary the reference has).

Shape discipline: dynamic user batches are padded to fixed (batch, seq-len)
buckets so XLA compiles a small closed set of programs; compile happens
lazily per bucket and is cached for the process lifetime.

Parity notes with the reference pipeline:
- query prefix "query: "                      (batch_processor.py:83)
- UNMASKED mean pooling                       (batch_processor.py:91)
- doc join "\\n---\\n"                          (batch_processor.py:100)
- prompt template                             (batch_processor.py:103)
- max_new_tokens=10, sampling on             (batch_processor.py:105)
- result envelope {"result": <text>} — but with the *generated text*
  instead of the reference's str(pipeline-output) repr (SURVEY §3.3 note).
"""

from __future__ import annotations

import functools
import logging
import os
import threading
import time
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rag_serving_system_tpu.config import Settings
from rag_serving_system_tpu.models import (
    DecoderConfig,
    EncoderConfig,
    decoder_config_for,
    encoder_config_for,
)
from rag_serving_system_tpu.core.prefix_cache import (
    PrefixEntry,
    PrefixKVCache,
    PromptSpec,
    split_prefix_tokens,
)
from rag_serving_system_tpu.models.e5 import encode
from rag_serving_system_tpu.models.qwen2 import (compute_prefix_kv, generate,
                                                 generate_packed,
                                                 prefill_for_pool,
                                                 prefill_packed_for_pool)
from rag_serving_system_tpu.models.tokenizer import (
    get_tokenizer,
    HashTokenizer,
    pad_and_stack,
)
from rag_serving_system_tpu.models.weights import get_decoder_params, get_encoder_params
from rag_serving_system_tpu.ops.topk import (cosine_topk_int8_chunked,
                                             cosine_topk_pallas,
                                             cosine_topk_pallas_int8,
                                             cosine_topk_reference,
                                             quantize_corpus_int8_chunked)
from rag_serving_system_tpu.parallel.sharded_topk import shard_corpus, sharded_cosine_topk
from rag_serving_system_tpu.utils.timing import StageTimer

logger = logging.getLogger(__name__)

PROMPT_TEMPLATE = "Context:\n{context}\n\nQuestion: {question}\n\nThe Answer to this question is: "
# the cacheable (question-independent) prompt prefix; tokenizer-boundary
# merges against the question text are handled by split_prefix_tokens
PREFIX_TEMPLATE = "Context:\n{context}\n\nQuestion:"
DOC_JOIN = "\n---\n"
QUERY_PREFIX = "query: "
# packed prefill must undercut the padded token count by this factor to be
# worth its per-token overhead (segment-masked flash + KV unpack-gather,
# ~10-15% measured on v5e); tunable for A/B via env
PACKED_MARGIN = float(os.environ.get("PACKED_MARGIN", "0.85"))
# suffix (question + answer cue) length buckets for the prefix-cache path —
# finer than the full-prompt buckets because suffixes are short. Suffix
# prefill cost is ~linear in the bucket length (it is MXU-bound), so the
# bucket set is tunable: SUFFIX_LEN_BUCKETS="24,32,64" adds a tighter bucket
# for short-question workloads at the cost of one more compiled program per
# batch bucket.
def _parse_len_buckets(spec: str) -> list[int]:
    try:
        out = sorted(int(x) for x in spec.split(",") if x.strip())
    except ValueError:
        logger.warning("unparseable SUFFIX_LEN_BUCKETS=%r; using default", spec)
        return [32, 64]
    out = [b for b in out if b > 0]  # 0/negative would compile (B, 0) shapes
    return out or [32, 64]


SUFFIX_LEN_BUCKETS = _parse_len_buckets(
    os.environ.get("SUFFIX_LEN_BUCKETS", "32,64"))


def pick_bucket(buckets: Sequence[int], n: int) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _batch_buckets(settings: Settings) -> list[int]:
    """Batch buckets with max_batch_size guaranteed covered — otherwise an
    oversized batch would silently run unbucketed shapes (new XLA compile per
    distinct size)."""
    buckets = sorted(set(settings.batch_buckets))
    if settings.max_batch_size > buckets[-1]:
        logger.warning(
            "MAX_BATCH_SIZE=%d exceeds the largest batch bucket %d; "
            "auto-appending it to the bucket set",
            settings.max_batch_size, buckets[-1])
        buckets.append(settings.max_batch_size)
    return buckets


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def _encode_compiled(params, cfg, ids, mask, dtype):
    return encode(params, cfg, ids, mask, pooling="mean_all", dtype=dtype)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "dtype", "k", "use_pallas"))
def _encode_retrieve_compiled(params, cfg, ids, mask, corpus, k, use_pallas, dtype,
                              corpus_scales=None, corpus_mean=None):
    """Single-dispatch fused embed→top-k (single-device path): the query
    embeddings never exist outside the XLA program. An int8 corpus arrives
    with its per-row scales + mean (RETRIEVAL_CORPUS_DTYPE=int8)."""
    emb = encode(params, cfg, ids, mask, pooling="mean_all", dtype=dtype)
    if corpus_scales is not None:
        return cosine_topk_pallas_int8(corpus, corpus_scales, emb, k,
                                       corpus_mean=corpus_mean,
                                       interpret=not use_pallas)
    if use_pallas:
        return cosine_topk_pallas(corpus, emb, k)
    return cosine_topk_reference(corpus, emb, k)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_seg_len", "do_sample", "dtype", "act_quant", "eos_bias"))
def _packed_prefill_pool(params, cfg, stream, gather, last, rng,
                         max_seg_len, do_sample, dtype, act_quant,
                         eos_bias=0.0):
    """Packed-prefill for the continuous decode pool: same compact host
    encoding as `_packed_unpack_and_generate`, but returns (tok0, k, v,
    prompt_mask) for slot insertion instead of running the fixed decode."""
    ids, seg, pos = stream[0][None], stream[1][None], stream[2][None]
    prompt_mask = (gather >= 0).astype(jnp.int32)
    row_valid = last >= 0
    return prefill_packed_for_pool(
        params, cfg, ids, seg, pos, jnp.maximum(last, 0),
        jnp.maximum(gather, 0), prompt_mask, rng, max_seg_len=max_seg_len,
        do_sample=do_sample, dtype=dtype, row_valid=row_valid,
        act_quant=act_quant, eos_bias=eos_bias)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "max_seg_len", "do_sample", "dtype", "act_quant",
    "spec_gamma", "eos_bias"))
def _packed_unpack_and_generate(params, cfg, stream, gather, last, rng,
                                row_budget, max_new_tokens, max_seg_len,
                                do_sample, dtype, act_quant, spec_gamma=0,
                                eos_bias=0.0):
    """Derive the packed-layout masks from the compact host encoding and run
    generate_packed (one XLA program per (T, P) shape):
      stream (3, T) = [ids | seg | pos]; gather (B, P) with -1 = empty slot;
      last (B,) with -1 = pad row; row_budget (B,) per-row token budget."""
    ids, seg, pos = stream[0][None], stream[1][None], stream[2][None]
    prompt_mask = (gather >= 0).astype(jnp.int32)
    row_valid = last >= 0
    return generate_packed(
        params, cfg, ids, seg, pos, jnp.maximum(last, 0),
        jnp.maximum(gather, 0), prompt_mask, rng,
        max_new_tokens=max_new_tokens, max_seg_len=max_seg_len,
        do_sample=do_sample, dtype=dtype, row_valid=row_valid,
        act_quant=act_quant, row_budget=row_budget, spec_gamma=spec_gamma,
        eos_bias=eos_bias)


class RagEngine:
    """Owns models, tokenizers, the device-resident corpus, and the compiled
    pipeline functions."""

    def __init__(
        self,
        settings: Settings,
        documents: List[str],
        doc_embeddings: np.ndarray,   # (N, D) f32 (pre-normalized or not)
        mesh=None,
    ):
        self.settings = settings
        self.batch_buckets = _batch_buckets(settings)
        self.documents = list(documents)
        self.dtype = jnp.bfloat16 if settings.dtype == "bfloat16" else jnp.float32

        # architecture: derived from the snapshot's own config.json when a
        # local checkpoint exists (any BERT/XLM-R encoder, any Llama-family
        # decoder incl. Qwen2/Mistral), else the preset
        from rag_serving_system_tpu.models.configs import (
            decoder_config_from_hf, encoder_config_from_hf)
        from rag_serving_system_tpu.models.weights import snapshot_hf_config

        enc_hf = snapshot_hf_config(settings.weights_dir, settings.embed_model_name)
        dec_hf = snapshot_hf_config(settings.weights_dir, settings.llm_model_name)
        self.enc_cfg: EncoderConfig = (
            encoder_config_from_hf(enc_hf) if enc_hf
            else encoder_config_for(settings.model_preset))
        self.dec_cfg: DecoderConfig = (
            decoder_config_from_hf(dec_hf) if dec_hf
            else decoder_config_for(settings.model_preset))
        if enc_hf or dec_hf:
            logger.info("architectures from snapshot config.json "
                        "(enc=%s, dec=%s)", bool(enc_hf), bool(dec_hf))

        t0 = time.time()
        self.enc_params, enc_real = get_encoder_params(
            self.enc_cfg, settings.weights_dir, settings.embed_model_name, self.dtype)
        self.dec_params, dec_real = get_decoder_params(
            self.dec_cfg, settings.weights_dir, settings.llm_model_name, self.dtype)
        logger.info("models ready in %.1fs (encoder weights: %s, decoder weights: %s)",
                    time.time() - t0,
                    "hf" if enc_real else "random-init",
                    "hf" if dec_real else "random-init")

        if settings.quant_weights in ("int8", "int4"):
            from rag_serving_system_tpu.ops.quant import quantize_decoder_params

            bits = 4 if settings.quant_weights == "int4" else 8
            self.dec_params = quantize_decoder_params(self.dec_params, bits=bits)
            logger.info("decoder weights quantized to %s (%s)",
                        settings.quant_weights,
                        "group-128 matmuls, int8 embed/head" if bits == 4
                        else "per-channel")
        self.act_quant = (settings.quant_act == "int8"
                          and settings.quant_weights in ("int8", "int4"))
        if settings.quant_act == "int8" and not self.act_quant:
            logger.warning("QUANT_ACT=int8 requires QUANT_WEIGHTS=int8/int4; "
                           "prefill stays bf16")

        # a real tokenizer loads when real weights were found, OR when the
        # model name is an explicit local directory (tokenizer-only
        # snapshot, e.g. data/bpe_tokenizer — lets host-path cost be
        # measured under real BPE without the 2 GB checkpoints; ids are
        # still valid for random-init weights as long as the tokenizer
        # vocab fits the model vocab, which _fits_vocab enforces)
        self.enc_tok = (self._fits_vocab(
                            get_tokenizer(settings.embed_model_name,
                                          self.enc_cfg.vocab_size),
                            self.enc_cfg.vocab_size)
                        if enc_real or os.path.isdir(settings.embed_model_name)
                        else None) or HashTokenizer(
                            self.enc_cfg.vocab_size,
                            pad_id=self.enc_cfg.pad_token_id)
        self.dec_tok = (self._fits_vocab(
                            get_tokenizer(settings.llm_model_name,
                                          self.dec_cfg.vocab_size),
                            self.dec_cfg.vocab_size)
                        if dec_real or os.path.isdir(settings.llm_model_name)
                        else None) or HashTokenizer(
                            self.dec_cfg.vocab_size,
                            pad_id=self.dec_cfg.pad_token_id,
                            eos_id=self.dec_cfg.eos_token_id)

        # corpus on device, normalized once (shared helper with retrievers)
        from rag_serving_system_tpu.core.retriever import _l2n

        emb = np.asarray(doc_embeddings, dtype=np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.enc_cfg.hidden_size:
            raise ValueError(
                f"corpus embeddings {emb.shape} do not match encoder hidden size "
                f"{self.enc_cfg.hidden_size} (model_preset={settings.model_preset!r}; "
                f"rebuild data with scripts/fact_dataset.py under the same preset)")

        if mesh is not None and mesh.devices.size > 1:
            # multi-chip serving: megatron-style TP over the "model" axis for
            # weights, batch dp over "data"; GSPMD inserts the collectives
            from rag_serving_system_tpu.parallel.tp import shard_params

            self.enc_params = shard_params(self.enc_params, mesh)
            self.dec_params = shard_params(self.dec_params, mesh)
        emb = _l2n(emb)
        self.n_docs = emb.shape[0]
        self.mesh = mesh
        corpus_dtype = settings.retrieval_corpus_dtype
        n_dev = 1 if mesh is None else mesh.devices.size
        if corpus_dtype == "int8" and n_dev > 1:
            logger.warning("int8 corpus is single-device only; the sharded "
                           "path streams bfloat16 instead")
            corpus_dtype = "bfloat16"
        corpus_dt = jnp.bfloat16 if corpus_dtype == "bfloat16" else jnp.float32
        self.corpus_scales = None
        self.corpus_mean = None
        self.corpus_chunks = None
        self.ivf_index = None
        retriever_kind = settings.retriever
        if retriever_kind == "ivf" and n_dev > 1:
            logger.warning("RETRIEVER=ivf is single-device only; the mesh "
                           "path serves the exact sharded scan instead")
            retriever_kind = "exact"
        if retriever_kind == "ivf":
            self._build_ivf(emb)
        elif n_dev > 1:
            self.corpus = shard_corpus(jnp.asarray(emb, dtype=corpus_dt), mesh)
        elif corpus_dtype == "int8":
            # host-side chunked quantization: no corpus-size device
            # transients, and corpora past the kernel's N×block_n compile
            # ceiling (e.g. 10M docs) split into per-chunk programs
            chunks, m = quantize_corpus_int8_chunked(
                emb, chunk_rows=settings.topk_chunk_rows)
            self.corpus_mean = m
            if len(chunks) == 1:
                self.corpus, self.corpus_scales = chunks[0]
            else:
                self.corpus_chunks = chunks
                logger.info("int8 corpus in %d chunks of <=%d rows",
                            len(chunks), settings.topk_chunk_rows)
        else:
            self.corpus = jax.device_put(jnp.asarray(emb, dtype=corpus_dt))
        self.use_pallas = jax.default_backend() == "tpu"
        self.max_k = min(settings.max_k, self.n_docs)
        self._rng = jax.random.PRNGKey(0)
        self.timer = StageTimer()

        # PACKED prefill (cold-path pad-waste killer, VERDICT r3 #1): only
        # engaged for no-prefix batches; single-device only (the packed
        # stream has no batch axis to dp-shard). B is pinned to the largest
        # batch bucket — decode is weight-streaming-bound so pad rows are
        # nearly free, and pinning collapses the compile matrix to the
        # packed-length buckets alone.
        self.packed = settings.packed_prefill and n_dev == 1
        # speculative decode (SPEC_DECODE=gamma): greedy-only by design —
        # sampling would need rejection resampling to stay distribution-true
        self.spec_gamma = settings.spec_gamma if not settings.do_sample else 0
        if self.spec_gamma:
            logger.info("speculative decode on: gamma=%d (greedy verify; "
                        "trained-checkpoint feature - PERFORMANCE.md "
                        "'Speculative decode')", self.spec_gamma)
        if self.packed:
            p_auto, mean_len = self._auto_packed_p(documents)
            self.packed_p = int(os.environ.get("PACKED_P", "0")) or p_auto
            cap = self.batch_buckets[-1]
            step = max(settings.packed_t_step,
                       1024 if self.use_pallas else 256)
            # flash_attention_packed requires T % 256 == 0; a step that
            # isn't a 256-multiple would silently drop every bucket to the
            # O(T^2) reference attention (review finding, round 4)
            step = -(-step // 256) * 256
            rnd = lambda v: min(-(-int(v) // step) * step,  # noqa: E731
                                -(-cap * self.packed_p // step) * step)
            # buckets: small sizes for partial batches, a fine ladder around
            # the sampled full-batch mean (the T distribution concentrates
            # there), and the hard top (every row at packed_p). The ladder
            # runs to 1.7x the estimate because the sample mean can sit well
            # under the served mean (retrieval favors long docs — measured
            # 284 sampled vs 385 served on squad_real, r4): a sum that
            # overflows the ladder would otherwise jump to the hard top and
            # pay MORE padding than the padded path it replaces.
            typ = cap * mean_len
            self.packed_t_buckets = sorted(
                {rnd(step * i) for i in (1, 2, 3, 4)}
                | {rnd(typ * f)
                   for f in (0.55, 0.65, 0.75, 0.85, 0.95, 1.05, 1.15,
                             1.25, 1.4, 1.55, 1.7)}
                | {rnd(cap * self.packed_p)})
            logger.info("packed prefill on: P=%d (sampled mean prompt %d), "
                        "T buckets %s", self.packed_p, mean_len,
                        self.packed_t_buckets)

        # exact prefix-KV cache. Under a mesh the VALUE pool is TP-sharded on
        # the flattened (Hk*D) dim — the same "model"-axis split as the
        # decoder's KV heads — and replicated over "data"; GSPMD keeps the
        # gather/scatter per-shard, so no device holds the whole pool.
        self.prefix_cache = None
        self.prefix_int8 = False
        from collections import OrderedDict
        from rag_serving_system_tpu.utils.lru import LockedLRU

        self._prefix_tok_cache = LockedLRU(4096)
        # full-prompt token memo: entries hold whole tokenized prompts, so
        # the capacity is env-tunable (PROMPT_TOKEN_CACHE=0 disables) —
        # at ~1k-token prompts 4096 entries retain order-100 MB host RAM
        self._prompt_tok_cache = LockedLRU(
            int(os.environ.get("PROMPT_TOKEN_CACHE", "4096")))
        # exact query-result cache (see embed_and_retrieve); LRU over exact
        # query text → top-max_k index list
        self._query_cache: OrderedDict | None = (
            OrderedDict() if settings.query_cache_size > 0 else None)
        self._query_cache_lock = threading.Lock()
        self.query_cache_hits = 0
        self.query_cache_misses = 0
        if settings.prefix_cache:
            c = self.dec_cfg
            # no point caching beyond the longest prompt the engine ever
            # prefills — clamping keeps short-prompt configs' decode window
            # (prefix slots + suffix) tight
            want_len = settings.prefix_pool_len
            if want_len is None:
                want_len = self._auto_pool_len(documents)
                logger.info("prefix pool auto-sized to %d tokens from "
                            "corpus statistics", want_len)
            pool_len = min(want_len, max(settings.prompt_len_buckets))
            self.prefix_int8 = settings.prefix_cache_dtype == "int8"
            slots = c.num_layers * 2 * pool_len * c.num_kv_heads
            if self.prefix_int8:  # int8 values + one f32 scale per head-dim row
                entry_bytes = slots * (c.head_dim + 4)
            else:
                entry_bytes = slots * c.head_dim * jnp.dtype(self.dtype).itemsize
            entry_shape = (c.num_layers, 2, pool_len, c.num_kv_heads,
                           c.head_dim)
            pool_sharding = None
            if n_dev > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                tp = mesh.shape.get("model", 1)
                kv_flat = c.num_kv_heads * c.head_dim
                spec = (P(None, None, None, "model")
                        if tp > 1 and kv_flat % tp == 0
                        else P(None, None, None, None))
                pool_sharding = NamedSharding(mesh, spec)
            self.prefix_cache = PrefixKVCache(
                sharding=pool_sharding,
                adaptive=settings.prefix_adaptive,
                window=settings.prefix_adaptive_window,
                low_hit_rate=settings.prefix_adaptive_low,
                probe_every=settings.prefix_probe_every,
                pool_len=pool_len,
                entry_bytes=entry_bytes,
                budget_mb=settings.prefix_cache_mb,
                entry_shape=entry_shape,
                dtype=self.dtype,
                int8=self.prefix_int8,
                # one batch may protect its hits + its own inserts from slot
                # reuse — guarantee a victim always exists past that
                min_slots=2 * self.batch_buckets[-1] + 1)
            # compute_prefix_kv compiles per batch shape — keep the shape set
            # tiny ({1, 8, cap}) so warmup can pre-compile ALL of them and no
            # XLA compile ever lands mid-serving on a cache miss
            cap = self.batch_buckets[-1]
            self.prefix_compute_buckets = sorted(
                {b for b in (1, 8, cap) if b <= cap})
            logger.info("prefix-KV cache on: pool_len=%d, %s storage, "
                        "%.1f MB/entry, capacity %d entries",
                        pool_len, "int8" if self.prefix_int8 else "compute",
                        entry_bytes / 2**20, self.prefix_cache.capacity)

        # continuous (in-flight) batching: DECODE_MODE=continuous replaces
        # the fixed-scan decode with a persistent slot pool (decode_pool.py)
        # — per-request completion, no completion-length variance tax.
        # Under a mesh the pool shards its SLOT axis over "data" (decode is
        # slot-local; GSPMD handles tp weight matmuls as in the fixed path).
        # Batches whose prompt bucket + max_new_tokens overflow the window
        # fall back to the fixed path inside the pool worker.
        self.decode_pool = None
        if settings.decode_mode == "continuous":
            from rag_serving_system_tpu.core.decode_pool import DecodePool

            cap = self.batch_buckets[-1]
            # slots may be SMALLER than a batch bucket: prefilled rows enter
            # the pool in waves as slots free (decode_pool._insert_wave)
            slots = max(1, settings.decode_slots or 2 * cap)
            dp = 1 if mesh is None else mesh.shape.get("data", 1)
            if slots % dp != 0:   # pad up so the slot axis dp-shards evenly
                slots = -(-slots // dp) * dp
            window = settings.decode_window
            if window == 0:
                window = -(-(max(settings.prompt_len_buckets)
                             + settings.max_new_tokens) // 128) * 128
            self.decode_pool = DecodePool(
                self, slots=slots, window=window,
                chunk=max(1, settings.decode_chunk), mesh=mesh)

    # ------------------------------------------------------------------
    # stage 1+2: embed + retrieve (device-fused; indices only to host)
    # ------------------------------------------------------------------

    def _build_ivf(self, emb: np.ndarray) -> None:
        """RETRIEVER=ivf: build the inverted-file index (ops/ivf.py) and
        gate it on recall@5 vs exact search before serving (VERDICT r3 #5 —
        a capacity escape hatch must be deployable AND verified). The gate
        queries are sampled corpus rows; exact ranks come from a chunked
        host-side scan so the dense corpus never needs device HBM (the
        point of IVF is corpora past the exact-scan regime)."""
        from rag_serving_system_tpu.ops.ivf import build_ivf, ivf_search

        s = self.settings
        n = emb.shape[0]
        n_clusters = s.ivf_clusters or max(8, min(n, int(4 * np.sqrt(n))))
        self.ivf_index = build_ivf(jnp.asarray(emb),
                                   n_clusters=min(n_clusters, n), iters=10)
        built = self.ivf_index.centroids.shape[0]
        self.ivf_nprobe = max(1, min(s.ivf_nprobe, built))
        self.corpus = None

        # recall gate: sampled corpus rows as queries, exact oracle on host
        # (settings.max_k, not self.max_k — this runs before __init__
        # assigns it; review finding, round 4)
        rng = np.random.default_rng(0)
        k_gate = max(1, min(5, s.max_k, n))
        q = emb[rng.choice(n, size=min(64, n), replace=False)]
        # chunked scan with a running top-k merge: the full (nq, N) score
        # matrix and a full argsort are exactly what the docstring promises
        # NOT to do at IVF scale (the gate only compares top-k SETS, so
        # within-k order is irrelevant). Review finding, round 4.
        best_s = best_i = None
        for i in range(0, n, 262144):
            sc = q @ emb[i:i + 262144].T
            kk = min(k_gate, sc.shape[1])
            part = np.argpartition(-sc, kk - 1, axis=1)[:, :kk]
            sc_top = np.take_along_axis(sc, part, axis=1)
            idx_top = part + i
            if best_s is None:
                best_s, best_i = sc_top, idx_top
            else:
                cat_s = np.concatenate([best_s, sc_top], axis=1)
                cat_i = np.concatenate([best_i, idx_top], axis=1)
                keep = np.argpartition(-cat_s, k_gate - 1,
                                       axis=1)[:, :k_gate]
                best_s = np.take_along_axis(cat_s, keep, axis=1)
                best_i = np.take_along_axis(cat_i, keep, axis=1)
        exact = best_i
        _, got = ivf_search(self.ivf_index, jnp.asarray(q), k_gate,
                            nprobe=self.ivf_nprobe)
        got = np.asarray(got)
        hits = sum(len(set(exact[i]) & set(got[i])) for i in range(len(q)))
        recall = hits / exact.size
        logger.info("IVF index: %d clusters, nprobe=%d, startup recall@%d "
                    "= %.3f (gate %.2f)", built, self.ivf_nprobe, k_gate,
                    recall, s.ivf_recall_gate)
        if recall < s.ivf_recall_gate:
            raise ValueError(
                f"IVF startup recall@{k_gate} = {recall:.3f} is below the "
                f"gate {s.ivf_recall_gate} — raise IVF_NPROBE (current "
                f"{self.ivf_nprobe}/{built} clusters), lower IVF_RECALL_GATE "
                f"explicitly, or serve RETRIEVER=exact (this corpus may not "
                f"cluster; see ops/ivf.py regime notes)")

    def _put_batch(self, arr):
        """Place a host batch on device; dp-sharded over the mesh "data" axis
        when the batch divides evenly, replicated otherwise."""
        arr = jnp.asarray(arr)
        if self.mesh is None or self.mesh.devices.size == 1:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.mesh.shape["data"]
        rest = (None,) * (arr.ndim - 1)
        spec = P("data", *rest) if arr.shape[0] % dp == 0 else P(None, *rest)
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _embed_jit(self, ids, mask):
        return _encode_compiled(self.enc_params, self.enc_cfg, ids, mask, self.dtype)

    def _topk(self, q_emb, k: int):
        if self.ivf_index is not None:
            from rag_serving_system_tpu.ops.ivf import ivf_search
            return ivf_search(self.ivf_index, q_emb, k,
                              nprobe=self.ivf_nprobe)
        if self.mesh is not None and self.mesh.devices.size > 1:
            return sharded_cosine_topk(self.corpus, q_emb, k, self.mesh,
                                       valid_n=self.n_docs, use_pallas=self.use_pallas)
        if self.corpus_chunks is not None:
            return cosine_topk_int8_chunked(self.corpus_chunks, q_emb, k,
                                            corpus_mean=self.corpus_mean,
                                            interpret=not self.use_pallas)
        if self.corpus_scales is not None:
            return cosine_topk_pallas_int8(self.corpus, self.corpus_scales,
                                           q_emb, k,
                                           corpus_mean=self.corpus_mean,
                                           interpret=not self.use_pallas)
        if self.use_pallas:
            return cosine_topk_pallas(self.corpus, q_emb, k)
        return cosine_topk_reference(self.corpus, q_emb, k)

    def embed_and_retrieve(self, queries: List[str], ks: List[int]) -> List[List[int]]:
        """Returns per-query document-index lists (variable k, host-sliced).

        Fronted by the exact query-result cache when enabled: retrieval is
        deterministic (fixed corpus + encoder weights + stable top-k
        tie-break), so an identical query string always yields the identical
        top-max_k list — hits skip the encode+retrieve dispatch AND its
        host-synced index transfer; an all-hit batch does no device work at
        all. Misses (deduplicated) run the normal path at their own batch
        bucket. Bit-exact by construction; stats in `query_cache_stats`."""
        if not queries:
            return []
        cap = self.batch_buckets[-1]
        if len(queries) > cap:
            # oversize direct calls are chunked to the largest compiled bucket
            # rather than running a one-off unbucketed XLA program
            out: List[List[int]] = []
            for i in range(0, len(queries), cap):
                out.extend(self.embed_and_retrieve(queries[i:i + cap], ks[i:i + cap]))
            return out
        # hard-clamp k to [1, max_k] (and corpus size): a single compiled top-k
        # shape serves every request — an attacker-supplied huge k must never
        # trigger an unbounded recompile (the merge loop unrolls k times)
        ks = [max(1, min(int(k), self.n_docs, self.max_k)) for k in ks]
        if self._query_cache is None:
            full = self._retrieve_full(queries)
            return [row[:k] for row, k in zip(full, ks)]
        with self._query_cache_lock:
            found = {}
            for q in queries:
                row = self._query_cache.get(q)
                if row is not None:
                    self._query_cache.move_to_end(q)
                    found[q] = row
            hits = sum(1 for q in queries if q in found)
            self.query_cache_hits += hits
            self.query_cache_misses += len(queries) - hits
            misses = list(dict.fromkeys(q for q in queries if q not in found))
        if misses:
            fresh = self._retrieve_full(misses)
            with self._query_cache_lock:
                for q, row in zip(misses, fresh):
                    found[q] = row
                    self._query_cache[q] = row
                    self._query_cache.move_to_end(q)
                while len(self._query_cache) > self.settings.query_cache_size:
                    self._query_cache.popitem(last=False)
        return [found[q][:k] for q, k in zip(queries, ks)]

    def query_cache_stats(self) -> dict | None:
        if self._query_cache is None:
            return None
        with self._query_cache_lock:
            lookups = self.query_cache_hits + self.query_cache_misses
            return {"entries": len(self._query_cache),
                    "capacity": self.settings.query_cache_size,
                    "hits": self.query_cache_hits,
                    "misses": self.query_cache_misses,
                    "hit_rate": (self.query_cache_hits / lookups)
                                if lookups else 0.0}

    def _retrieve_full(self, queries: List[str]) -> List[List[int]]:
        """Device path: encode + top-max_k for ≤cap queries; one host sync."""
        bsz = pick_bucket(self.batch_buckets, len(queries))
        texts = [QUERY_PREFIX + q for q in queries] + [""] * (bsz - len(queries))
        rows = self.enc_tok.encode_many(texts)  # ONE batch call (GIL-free on HF)
        max_len = pick_bucket(self.settings.encode_len_buckets,
                              max(len(r) for r in rows[:len(queries)]))
        ids, mask = pad_and_stack(rows, max_len, self.enc_tok.pad_id,
                                  pad_side="right")
        # fully padded rows would make the unmasked mean degenerate; give the
        # pad rows one real token so the forward is well-defined (discarded)
        mask[len(queries):, 0] = 1
        k = self.max_k
        if (self.mesh is not None and self.mesh.devices.size > 1) \
                or self.corpus_chunks is not None \
                or self.ivf_index is not None:
            # chunked corpora dispatch one program per chunk (a single fused
            # module would recreate the N×block_n compile ceiling); IVF runs
            # its own two-stage search program
            q_emb = self._embed_jit(self._put_batch(ids), self._put_batch(mask))
            _, idx = self._topk(q_emb, k)
        else:
            # single fused dispatch: encode + top-k in one XLA program
            _, idx = _encode_retrieve_compiled(
                self.enc_params, self.enc_cfg, jnp.asarray(ids),
                jnp.asarray(mask), self.corpus, k, self.use_pallas, self.dtype,
                corpus_scales=self.corpus_scales,
                corpus_mean=self.corpus_mean)
        idx = np.asarray(idx)  # single device→host transfer
        # IVF pads short candidate lists with -1 (fewer than k reachable
        # docs at this nprobe); Python negative indexing would silently
        # substitute documents[-1] into the context — drop the sentinels
        # instead (review finding, round 4)
        return [[int(j) for j in idx[i, :k] if j >= 0]
                for i in range(len(queries))]

    # ------------------------------------------------------------------
    # stage 3: generate
    # ------------------------------------------------------------------

    def generate_answers(self, prompts: List[str]) -> List[str]:
        if not prompts:
            return []
        with self.timer.stage("generate"):
            return self._generate_answers(prompts)

    def _generate_answers(self, prompts: List[str]) -> List[str]:
        cap = self.batch_buckets[-1]
        if len(prompts) > cap:
            out: List[str] = []
            for i in range(0, len(prompts), cap):
                out.extend(self._generate_answers(prompts[i:i + cap]))
            return out
        return self.finalize_tokens(self.generate_tokens(prompts))

    def _auto_pool_len(self, documents: List[str]) -> int:
        """Size the prefix pool from corpus statistics: tokenize sampled
        2-doc context prefixes (k=2 is the API default) and cover the MAX
        sampled length, rounded up to a 128 multiple. A pool that covers the
        whole context collapses steady-state suffixes to the question-only
        bucket — on real-SQuAD prompts that is the difference between
        prefilling ~128 overflow tokens per request and ~32 (measured 2.3×
        end-to-end, PERFORMANCE.md). Max, not a percentile: retrieval
        concentrates on a few hot contexts (with random-init or real
        encoders alike), so a percentile of a UNIFORM doc sample says
        nothing about the hot set — a p75-sized pool measured 135.9 ms/batch
        device-side on squad_real vs 57.5 for a covering pool, while
        oversizing only costs lazily-grown HBM proportional to live entries.
        Clamped to [128, 768]; contexts beyond the clamp still split (their
        overflow rides the suffix buckets)."""
        if not documents:
            return 384
        n = len(documents)
        step = max(1, n // 64)
        sample = [documents[i] for i in range(0, n, step)][:64]
        longest = max(
            len(self.dec_tok.encode(PREFIX_TEMPLATE.format(
                context=f"{doc}\n---\n{sample[(i + 1) % len(sample)]}")))
            for i, doc in enumerate(sample))
        return min(768, max(128, -(-longest // 128) * 128))

    @staticmethod
    def _fits_vocab(tok, vocab_size: int):
        """Guard a loaded tokenizer against the model's embedding table: a
        tokenizer with more ids than the model has rows would index out of
        range. Returns the tokenizer, or None to trigger the hash fallback."""
        hf = getattr(tok, "tok", None)
        if hf is None:
            return tok  # hash fallback is constructed at the model vocab
        if len(hf) > vocab_size:
            logger.warning(
                "tokenizer vocab %d exceeds model vocab %d — falling back "
                "to the hash tokenizer", len(hf), vocab_size)
            return None
        return tok

    def _auto_packed_p(self, documents: List[str]) -> tuple[int, int]:
        """Packed-mode per-row cache bucket: sample FULL prompts (2-doc
        context + a typical-length question) and cover the max, picked from
        the configured prompt buckets (so PACKED_P aligns with the padded
        path's shapes). Returns (bucket, sampled mean prompt tokens) — the
        mean centers the packed-length bucket ladder."""
        buckets = self.settings.prompt_len_buckets
        if not documents:
            return buckets[-1], max(buckets[0] // 2, 16)
        n = len(documents)
        step = max(1, n // 64)
        sample = [documents[i] for i in range(0, n, step)][:64]
        q = "what is the answer to this sampled question about the subject?"
        lens = [len(self.dec_tok.encode(PROMPT_TEMPLATE.format(
                    context=f"{doc}{DOC_JOIN}{sample[(i + 1) % len(sample)]}",
                    question=q)))
                for i, doc in enumerate(sample)]
        # +32 headroom: real questions can run longer than the placeholder
        return (pick_bucket(buckets, max(lens) + 32),
                max(16, sum(lens) // len(lens)))

    def _stage_packed(self, rows: list, n: int, t: int, budgets=None):
        """Build the packed prompt layout (see models/qwen2.py
        prefill_packed): rows back-to-back in one (1, T) stream. Host side
        produces FOUR device puts: a (3, T) [ids | seg | pos] stream, the
        (B, P) gather map (-1 = empty slot), (B,) last-token indices
        (-1 = pad row), and the (B,) per-row generation budgets. B is pinned
        to the largest batch bucket. `t` is the packed-length bucket
        stage_prompts already picked (it gates packed vs padded on it)."""
        cap = self.batch_buckets[-1]
        if budgets is None:
            budgets = np.full((cap,), self.settings.max_new_tokens, np.int32)
        p = self.packed_p
        rows = [r[-p:] for r in rows[:n]]          # left-truncate over-long
        stream = np.zeros((3, t), dtype=np.int32)
        stream[0] = self.dec_tok.pad_id
        stream[1] = cap                             # pad segment id
        gather = np.full((cap, p), -1, dtype=np.int32)
        last = np.full((cap,), -1, dtype=np.int32)
        off = 0
        for b, r in enumerate(rows):
            ln = len(r)
            stream[0, off:off + ln] = r
            stream[1, off:off + ln] = b
            stream[2, off:off + ln] = np.arange(ln)
            gather[b, p - ln:] = off + np.arange(ln)
            last[b] = off + ln - 1
            off += ln
        return ("packed", self._put_batch(stream), self._put_batch(gather),
                self._put_batch(last), n,
                (self._put_batch(budgets), tuple(int(x) for x in budgets)))

    def _generate_packed_dispatch(self, stream, gather, last, rng, budgets):
        """Single packed-generate dispatch. The tiny derivations (masks from
        the -1 coding) happen inside the jit so the host ships 4 tensors."""
        return _packed_unpack_and_generate(
            self.dec_params, self.dec_cfg, stream, gather, last, rng,
            budgets, self.settings.max_new_tokens, self.packed_p,
            self.settings.do_sample, self.dtype, self.act_quant,
            spec_gamma=self.spec_gamma, eos_bias=self.settings.eos_bias)

    def _prefix_tokens(self, key, prefix_text: str) -> list:
        """Tokenize a context prefix, memoized by cache key — rows sharing a
        context (and repeat batches on cache hits) were re-tokenizing the
        same ~400-token prefix once per row (advisor finding, round 2)."""
        toks = self._prefix_tok_cache.get(key)
        if toks is None:
            toks = self.dec_tok.encode(prefix_text)
            self._prefix_tok_cache.put(key, toks)
        return toks

    def _prompt_tokens(self, text: str) -> list:
        """Tokenize a full prompt, memoized by the prompt string itself —
        whenever queries repeat (the common serving regime; both caches
        above exist because of it) the whole ~100-400-token prompt string
        repeats too, and tokenization is deterministic, so re-encoding it
        per batch is pure GIL time on the dispatch thread. Downstream only
        slices these lists (pad_and_stack / split_prefix_tokens copy), so
        sharing the cached list is safe."""
        # plain-str key: PromptSpec instances drag prefix_text + cache_key
        # along (≈2× the prompt bytes per retained entry)
        key = str(text)
        toks = self._prompt_tok_cache.get(key)
        if toks is None:
            toks = self.dec_tok.encode(key)
            self._prompt_tok_cache.put(key, toks)
        return toks

    def _prompt_tokens_batch(self, texts) -> list:
        """Memo-fronted BATCH prompt tokenization: cache misses go through
        the tokenizer's one-call batch API (Rust encode_batch on HF — the
        GIL is released and rows parallelize; VERDICT r3 #3) instead of a
        per-row Python loop. Unique-query workloads miss the memo on every
        row, so the miss path IS the steady-state cost there."""
        keys = [str(t) for t in texts]
        out = [self._prompt_tok_cache.get(k) for k in keys]
        miss = [i for i, v in enumerate(out) if v is None]
        if miss:
            # dedup within the batch (rows often share a prompt on repeats)
            uniq = list(dict.fromkeys(keys[i] for i in miss))
            fresh = dict(zip(uniq, self.dec_tok.encode_many(uniq)))
            for i in miss:
                toks = fresh[keys[i]]
                self._prompt_tok_cache.put(keys[i], toks)
                out[i] = toks
        return out

    def stage_prompts(self, prompts: List[str]):
        """Tokenize, pad, and ship a prompt batch to the DEVICE. Runs on the
        stage-1 (prefetch) thread so the tokenizer work and the host→device
        transfers (3 tunnel puts — tens of ms of latency each under a remote
        device) overlap the previous batch's generation instead of sitting on
        the dispatch critical path.

        With the prefix-KV cache on, each prompt is split at its cacheable
        context boundary: only the SUFFIX (question + answer cue) is staged
        as input ids; the per-row (cache key, prefix tokens) travel alongside
        for `generate_tokens` to resolve against the cache at dispatch time
        (dispatch-side resolution keeps LRU eviction race-free)."""
        bsz = pick_bucket(self.batch_buckets, len(prompts))
        n = len(prompts)
        padded = list(prompts) + [""] * (bsz - n)
        rows = self._prompt_tokens_batch(padded)  # tokenize ONCE, memo + batch
        # per-row generation budgets (request-level max_new_tokens, clamped
        # to the engine cap; pad rows get the cap — they are born done).
        # ALWAYS staged as a (bsz,) array so there is exactly one trace
        # family: default requests decode bit-identically (a row whose
        # budget equals the cap hits the budget cut on the loop's final
        # column, after its last token is already written).
        cap_mnt = self.settings.max_new_tokens

        def _bud(p):
            b = getattr(p, "gen_budget", None)
            # None = engine default; 0/negative clamp to 1 (not to the cap —
            # 0 is falsy, so `or` would silently promote it)
            return cap_mnt if b is None else min(cap_mnt, max(1, int(b)))

        bud_host = tuple(_bud(p) if i < n else cap_mnt
                         for i, p in enumerate(padded))
        # the (bsz,) device put is deferred past the packed/padded decision:
        # the packed path stages its own (cap,) budget array and would
        # discard this one (one dead tunnel put per packed batch otherwise)

        metas = None
        if (self.prefix_cache is not None
                and any(getattr(p, "cache_key", None) is not None
                        for p in prompts)
                and self.prefix_cache.should_attempt()):
            # should_attempt: adaptive thrash gate — when the rolling hit
            # rate collapses (working set > capacity, cyclic access), most
            # batches run the plain full-prefill trace; periodic probe
            # batches keep the cache ready to re-engage
            pool_len = self.prefix_cache.pool_len
            max_cov = pool_len + self.settings.prompt_len_buckets[-1]
            metas, suffix_rows = [], []
            for i in range(bsz):
                full = rows[i]
                key = getattr(padded[i], "cache_key", None) if i < n else None
                m = 0
                if key is not None and len(full) <= max_cov:
                    pre = self._prefix_tokens(key, padded[i].prefix_text)
                    m = split_prefix_tokens(full, pre, pool_len)
                    if m < self.prefix_cache.min_tokens:
                        m = 0
                if m > 0:
                    metas.append((key, tuple(full[:m])))
                else:
                    metas.append(None)
                    if i < n:
                        self.prefix_cache.note_bypass()
                suffix_rows.append(full[m:])
            if any(m is not None for m in metas):
                rows = suffix_rows
                plen = pick_bucket(
                    SUFFIX_LEN_BUCKETS + self.settings.prompt_len_buckets,
                    max((len(r) for r in rows[:n]), default=1))
            else:
                # ALL rows bypassed (short contexts / over-long prompts): run
                # the plain no-prefix trace at a PROMPT bucket — a suffix
                # bucket here would hit a (batch, 32/64) no-prefix shape that
                # warmup never compiles (advisor finding, round 2)
                metas = None
                plen = pick_bucket(self.settings.prompt_len_buckets,
                                   max(len(r) for r in rows[:n]))
        else:
            plen = pick_bucket(self.settings.prompt_len_buckets,
                               max(len(r) for r in rows[:n]))
        if metas is None and self.packed:
            # no-prefix batch: packed layout (FLOPs scale with sum(len),
            # not bsz * plen). Packing pays a per-token overhead (segment-
            # masked flash + the KV unpack-gather), so only engage when the
            # packed T bucket genuinely undercuts the padded program's token
            # count; otherwise the padded trace is strictly better. Rows
            # longer than packed_p (the per-row KV bucket) would be
            # truncated harder than the padded path's plen bucket would
            # truncate them — those batches MUST take the padded trace or
            # the bit-identical guarantee breaks (review finding, round 4).
            if max(len(r) for r in rows[:n]) <= self.packed_p:
                total = sum(len(r) for r in rows[:n])
                t = pick_bucket(self.packed_t_buckets, total)
                if t <= PACKED_MARGIN * bsz * plen:
                    cap = self.batch_buckets[-1]
                    pb = np.full((cap,), cap_mnt, np.int32)
                    pb[:min(n, cap)] = bud_host[:min(n, cap)]
                    return self._stage_packed(rows, n, t, pb)
        # truncate_side="left": over-long prompts keep the tail (the question
        # and the answer cue), dropping leading context instead
        ids, mask = pad_and_stack(rows, plen, self.dec_tok.pad_id,
                                  pad_side="left", truncate_side="left")
        mask[n:, -1] = 1  # keep pad rows well-defined
        # pad rows are born done so EOS early-exit fires on partial batches
        row_valid = np.arange(bsz) < n
        bud = (self._put_batch(np.asarray(bud_host, np.int32)), bud_host)
        return ("padded", self._put_batch(ids), self._put_batch(mask),
                self._put_batch(row_valid), n, metas, bud)

    def generate_tokens(self, prompts: List[str] | None = None, staged=None):
        """Dispatch generation; returns an opaque handle WITHOUT forcing the
        device→host transfer. JAX dispatch is async, so the caller can keep
        the device busy (next batch's prefill) and `finalize_tokens` the
        previous handle while this one runs — the token transfer, host
        detokenize, and result delivery all leave the critical path.

        Pass `staged` (from stage_prompts, prepared on another thread) to
        keep this call to a bare dispatch."""
        if staged is None:
            staged = self.stage_prompts(prompts)
        self._rng, rng = jax.random.split(self._rng)
        if staged[0] == "packed":
            _, stream, gather, last, n, bud = staged
            return self._generate_packed_dispatch(
                stream, gather, last, rng, bud[0]), n
        _, ids, mask, row_valid, n, metas, bud = staged
        prefix_kv = prefix_len = None
        if metas is not None and any(m is not None for m in metas):
            with self.timer.stage("prefix_resolve"):
                prefix_kv, prefix_len = self._resolve_prefixes(metas)
        toks = generate(self.dec_params, self.dec_cfg, ids, mask, rng,
                        max_new_tokens=self.settings.max_new_tokens,
                        do_sample=self.settings.do_sample, dtype=self.dtype,
                        row_valid=row_valid,
                        act_quant=self.act_quant,
                        prefix_kv=prefix_kv, prefix_len=prefix_len,
                        row_budget=bud[0], spec_gamma=self.spec_gamma,
                        eos_bias=self.settings.eos_bias)
        return toks, n

    def prefill_rows(self, staged, rng):
        """Prefill a staged batch for the continuous decode pool: returns
        (tok0 (B,), k (L, B, T, Hk, D), v, mask (B, T), n) — the prompt KV
        rows, combined validity mask (prefix part included when the
        prefix-KV cache contributed), the first sampled token per row, and
        the real-row count. Shares every staging/prefix/packed trick with
        the fixed path (`generate_tokens`); only the decode differs."""
        s = self.settings
        if staged[0] == "packed":
            _, stream, gather, last, n, _bud = staged
            tok0, k, v, mask = _packed_prefill_pool(
                self.dec_params, self.dec_cfg, stream, gather, last, rng,
                self.packed_p, s.do_sample, self.dtype, self.act_quant,
                eos_bias=s.eos_bias)
            return tok0, k, v, mask, n
        _, ids, mask, row_valid, n, metas, _bud = staged
        prefix_kv = prefix_len = None
        if metas is not None and any(m is not None for m in metas):
            with self.timer.stage("prefix_resolve"):
                prefix_kv, prefix_len = self._resolve_prefixes(metas)
        tok0, k, v, cmask = prefill_for_pool(
            self.dec_params, self.dec_cfg, ids, mask, rng,
            do_sample=s.do_sample, dtype=self.dtype, row_valid=row_valid,
            act_quant=self.act_quant, prefix_kv=prefix_kv,
            prefix_len=prefix_len, eos_bias=s.eos_bias)
        return tok0, k, v, cmask, n

    def _resolve_prefixes(self, metas):
        """Map per-row (key, prefix tokens) to pool slots: cache hits are
        reused; the batch's distinct misses are computed in ONE batched
        `compute_prefix_kv` dispatch (dedup means a context shared by several
        rows — or repeated across batches — prefills once) and written to
        their slots with one donated scatter. The per-row prefix KV is then a
        single device GATHER `pool[slots]` — rows without a prefix read the
        permanent zeros slot. Returns the (B, L, 2, PL, Hk, D) prefix KV
        (or an (int8 values, scales) pair) and (B,) valid lengths."""
        cache = self.prefix_cache
        pool_len = cache.pool_len
        entries: list = []
        need: dict = {}
        for meta in metas:
            if meta is None:
                entries.append(None)
                continue
            key, toks = meta
            # the entry key includes the token-split length: rows sharing a
            # doc set can still split at different BPE boundaries (their
            # questions merge differently), and binding them to one entry
            # would drop/duplicate the boundary tokens for the other row
            ekey = (key, len(toks))
            e = cache.get(ekey, toks)
            if e is None:
                need.setdefault(ekey, toks)
                entries.append(ekey)    # placeholder, filled below
            else:
                entries.append(e)
        if need:
            keys = list(need)
            mb = pick_bucket(self.prefix_compute_buckets, len(keys))
            rows = [list(need[k]) for k in keys] + [[]] * (mb - len(keys))
            pids, pmask = pad_and_stack(rows, pool_len, self.dec_tok.pad_id,
                                        pad_side="right")
            pmask[len(keys):, 0] = 1  # keep pad rows well-defined
            kv = compute_prefix_kv(self.dec_params, self.dec_cfg,
                                   jnp.asarray(pids), jnp.asarray(pmask),
                                   dtype=self.dtype, act_quant=self.act_quant)
            if self.prefix_int8:
                from rag_serving_system_tpu.models.qwen2 import quantize_prefix_kv
                kv = quantize_prefix_kv(kv)
            hit_slots = {e.slot for e in entries if isinstance(e, PrefixEntry)}
            fresh = cache.put_batch(keys, [need[k] for k in keys], kv,
                                    protected=hit_slots)
            entries = [fresh.get(e, e) if not isinstance(e, PrefixEntry) else e
                       for e in entries]
        prefix_len = jnp.asarray(
            [len(e.tokens) if e is not None else 0 for e in entries],
            dtype=jnp.int32)
        slots = [e.slot if e is not None else cache.zero_slot for e in entries]
        return cache.gather(slots), prefix_len

    def finalize_tokens(self, handle) -> List[str]:
        """Block on the device tokens and detokenize (see generate_tokens)."""
        toks_dev, n = handle
        toks = np.asarray(toks_dev)
        strip = {self.dec_cfg.pad_token_id, self.dec_cfg.eos_token_id,
                 *getattr(self.dec_cfg, "eos_token_ids", ())}
        out = []
        for i in range(n):
            row = [t for t in toks[i] if t not in strip]
            out.append(self.dec_tok.decode(row))
        return out

    # ------------------------------------------------------------------
    # full pipeline
    # ------------------------------------------------------------------

    def prepare(self, queries: List[str], ks: List[int],
                budgets: List[int | None] | None = None) -> List[str]:
        """Stage 1: embed + retrieve + prompt build. Separated from stage 2 so
        the batch processor can overlap it with the previous batch's
        generation (host work + retrieval dispatch hide under decode).

        `budgets` (optional, per request) is the request-level
        max_new_tokens; it rides each PromptSpec so downstream batching /
        length-aware reordering keeps budgets row-aligned."""
        if budgets is None:
            budgets = [None] * len(queries)
        with self.timer.stage("embed_retrieve"):
            doc_idx = self.embed_and_retrieve(queries, ks)
            contexts = [DOC_JOIN.join(self.documents[i] for i in row)
                        for row in doc_idx]
            if self.prefix_cache is None:
                return [PROMPT_TEMPLATE.format(context=c, question=q)
                        if b is None else
                        PromptSpec(PROMPT_TEMPLATE.format(context=c,
                                                          question=q),
                                   gen_budget=b)
                        for q, c, b in zip(queries, contexts, budgets)]
            # PromptSpec rides through batching/reordering as a plain str but
            # carries the cacheable context prefix and its identity key
            return [PromptSpec(PROMPT_TEMPLATE.format(context=c, question=q),
                               prefix_text=PREFIX_TEMPLATE.format(context=c),
                               cache_key=("ctx", tuple(row)), gen_budget=b)
                    for q, c, row, b in zip(queries, contexts, doc_idx,
                                            budgets)]

    def process(self, queries: List[str], ks: List[int],
                budgets: List[int | None] | None = None) -> List[dict]:
        """Full RAG for a batch. Returns per-request result dicts."""
        t0 = time.time()
        prompts = self.prepare(queries, ks, budgets)
        t1 = time.time()
        answers = self.generate_answers(prompts)
        t2 = time.time()
        logger.info("batch=%d embed+retrieve=%.3fs generate=%.3fs",
                    len(queries), t1 - t0, t2 - t1)
        return [{"result": a} for a in answers]

    def warmup(self, batch_sizes: Sequence[int] | None = None) -> None:
        """Pre-compile the hot buckets so first requests don't pay compile.

        WARMUP_FULL=1 covers the FULL compile matrix — every (batch bucket ×
        encode bucket) stage-1 shape and every (batch bucket × suffix bucket)
        prefix-generate shape — so no XLA compile can ever land mid-serving.
        That is the static-shape tax of bucketed XLA serving; the persistent
        compile cache makes it one-time per machine.

        After the first end-to-end batch (serial — it compiles the shared
        pipeline programs), the remaining matrix entries are INDEPENDENT XLA
        programs, so they compile CONCURRENTLY on a thread pool: XLA releases
        the GIL during compilation and keys its in-process/persistent caches
        per program, so distinct shapes parallelize across host cores
        (WARMUP_COMPILE_WORKERS, default 8; =1 restores serial warmup)."""
        import os

        sizes = list(batch_sizes or [self.settings.max_batch_size])
        jobs: list = []   # (label, zero-arg thunk) — independent programs
        # stage-1 embed+retrieve per (batch, encode-len) bucket. The queries
        # must be DISTINCT per row and per job: the query-result cache dedups
        # misses and serves repeats from the cache, so `[q] * b` would
        # collapse every job to a one-query dispatch and the larger encode
        # batch buckets would never compile (review finding, round 3).
        for b in sizes:
            for elen in self.settings.encode_len_buckets:
                # one distinct lead word per (b, elen, row) keeps each row a
                # fresh cache miss while the shared tail pins the token count
                # into the elen bucket
                tail = " ".join(f"w{i}" for i in range(max(elen - 10, 1)))
                qs = [f"u{b}e{elen}r{r} {tail}" for r in range(b)]
                jobs.append((f"encode b{b} len{elen}", functools.partial(
                    self.embed_and_retrieve, qs, [1] * b)))
        # FULL-prompt generate coverage. With PACKED prefill on, a no-prefix
        # batch (prefix cache off, adaptive bypass, all-bypass) runs the
        # packed trace — one program per packed-length bucket — but falls
        # back to the padded trace whenever the packed bucket would not
        # undercut bsz*plen (PACKED_MARGIN gate in stage_prompts), so BOTH
        # matrices must be compiled; with packing off only the padded one
        # is reachable. Either way, the first such batch must never pay a
        # multi-minute XLA compile mid-serving.
        if self.packed:
            for t in self.packed_t_buckets:
                self._rng, rng = jax.random.split(self._rng)
                jobs.append((f"packed-generate t{t}", functools.partial(
                    self._warm_packed, t, rng)))
        cap = int(os.environ.get("WARMUP_PROMPT_CAP", "1024"))
        skipped = [p for p in self.settings.prompt_len_buckets if p > cap]
        if skipped:
            logger.warning(
                "warmup skipping prompt buckets %s > cap %d "
                "(raise WARMUP_PROMPT_CAP to cover them); the first "
                "batch landing there will compile mid-serving",
                skipped, cap)
        for b in sizes:
            for plen in self.settings.prompt_len_buckets:
                if plen > cap:
                    continue
                self._rng, rng = jax.random.split(self._rng)
                jobs.append((f"generate b{b} p{plen}", functools.partial(
                    self._warm_generate, b, plen, rng)))
        if self.prefix_cache is not None:
            # pre-compile every miss-compute shape (see prefix_compute_buckets)
            # AND the matching pool-scatter shape — put_batch scatters the
            # full bucketed row count (pads go to the scratch slot), so this
            # covers the exact program the first real miss batch runs
            for mb in self.prefix_compute_buckets:
                jobs.append((f"prefix_kv m{mb}", functools.partial(
                    self._warm_prefix_compute, mb)))
            jobs.extend(self._prefix_suffix_jobs(sizes))
            # seed the persistent compile cache with the gather/scatter
            # programs for every lazy-growth pool size (AOT — allocates
            # nothing), so a mid-serving growth compiles from disk
            jobs.append(("pool growth AOT", functools.partial(
                self.prefix_cache.warm_compiles,
                gather_counts=self.batch_buckets,
                scatter_counts=self.prefix_compute_buckets)))
        if self.decode_pool is not None:
            # continuous-mode prefill programs (prefill_for_pool & friends)
            # are DISTINCT XLA programs from the fixed generate matrix —
            # cover the same (batch, length) shapes so no pool batch ever
            # compiles mid-serving. Pure forwards: safe to run concurrently.
            jobs.extend(self._pool_prefill_jobs(sizes, cap))
        self._run_warmup_jobs(jobs)
        if self.decode_pool is not None:
            # insert + decode-chunk programs mutate (donate) the pool state
            # — compiled SERIALLY after the concurrent pass, with inactive
            # rows so the live pool state stays semantically empty
            self._warm_pool_state(sizes, cap)
        # end-to-end sanity batches — every program they need was compiled
        # above, so these run at serving speed
        for b in sizes:
            self.process(["warmup query"] * b, [1] * b)
        if self.decode_pool is not None:
            # one end-to-end batch THROUGH the pool (stage → prefill →
            # insert → chunks → deliver), mirroring the fixed-path sanity
            pool = self.decode_pool
            bcap = self.batch_buckets[-1]
            if not pool._running:
                pool.start()
            got: list = []
            pool.submit([f"w{i}" for i in range(bcap)],
                        ["pool warmup query"] * bcap,
                        lambda rid, res: got.append(rid))
            if not pool.wait_idle(300.0) or len(got) != bcap:
                raise RuntimeError(
                    f"decode-pool warmup batch incomplete "
                    f"({len(got)}/{bcap} delivered)")
        if self.prefix_cache is not None:
            # a long question lands in the bigger suffix bucket — exercise it
            long_q = "warmup " + " ".join(f"word{i}" for i in range(45))
            self.process([long_q] * self.batch_buckets[-1],
                         [1] * self.batch_buckets[-1])
        # warmup stage times are compile times — drop them so the /stats
        # means reflect serving, not XLA; warmup's synthetic queries likewise
        # must not pollute the query-cache hit-rate stats
        self.timer.reset()
        with self._query_cache_lock:
            self.query_cache_hits = 0
            self.query_cache_misses = 0

    def _warm_packed(self, t: int, rng) -> None:
        """One packed-generate program at packed-length bucket t (B and P
        are engine-static, so t alone keys the program). Delegates the
        layout to _stage_packed so the warmed trace can never drift from
        the serving trace (review finding, round 4)."""
        cap = self.batch_buckets[-1]
        ln = max(1, min(self.packed_p, t // cap))
        rows = [[self.dec_tok.pad_id] * ln
                for _ in range(min(cap, t // ln))]
        _, stream, gather, last, _, bud = self._stage_packed(rows, len(rows), t)
        self._generate_packed_dispatch(stream, gather, last, rng, bud[0])

    def _warm_generate(self, b: int, plen: int, rng) -> None:
        """One no-prefix generate program at (batch=b, prompt=plen)."""
        ids = jnp.zeros((b, plen), jnp.int32)
        mask = jnp.zeros((b, plen), jnp.int32).at[:, -1].set(1)
        generate(self.dec_params, self.dec_cfg, ids, mask, rng,
                 max_new_tokens=self.settings.max_new_tokens,
                 do_sample=self.settings.do_sample, dtype=self.dtype,
                 row_valid=jnp.ones((b,), bool), act_quant=self.act_quant,
                 row_budget=jnp.full((b,), self.settings.max_new_tokens,
                                     jnp.int32),
                 spec_gamma=self.spec_gamma,
                 eos_bias=self.settings.eos_bias)

    def _warm_prefix_compute(self, mb: int) -> None:
        """One prefix-miss compute+scatter program at miss-bucket mb."""
        pool_len = self.prefix_cache.pool_len
        ids = np.zeros((mb, pool_len), np.int32)
        mask = np.zeros((mb, pool_len), np.int32)
        mask[:, 0] = 1
        kv = compute_prefix_kv(self.dec_params, self.dec_cfg,
                               jnp.asarray(ids), jnp.asarray(mask),
                               dtype=self.dtype, act_quant=self.act_quant)
        if self.prefix_int8:
            from rag_serving_system_tpu.models.qwen2 import quantize_prefix_kv
            kv = quantize_prefix_kv(kv)
        self.prefix_cache.put_batch([("_warmup_", mb)], [(0,)], kv)

    def _run_warmup_jobs(self, jobs) -> None:
        """Execute independent warmup programs, concurrently when allowed.

        Each job compiles AND runs its program, so N workers can have N
        programs' live temp buffers on the device at once — at the big end
        of the matrix that transient sum can exhaust HBM even though every
        program fits comfortably alone (observed: a squad_synthetic warmup
        that passed one session OOMed the next). Jobs that fail with
        RESOURCE_EXHAUSTED are therefore retried serially after the pool
        drains — one program's working set at a time is the same memory
        profile serving has, so a serial failure is a real capacity error
        and propagates."""
        import os

        if not jobs:
            return
        workers = int(os.environ.get("WARMUP_COMPILE_WORKERS", "8"))
        t0 = time.time()
        retry = []
        if workers <= 1 or len(jobs) == 1:
            for _, fn in jobs:
                fn()
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as ex:
                futures = [(label, fn, ex.submit(fn)) for label, fn in jobs]
                for label, fn, fut in futures:
                    try:
                        fut.result()  # surface failures with their label
                    except Exception as e:
                        if "RESOURCE_EXHAUSTED" in str(e):
                            retry.append((label, fn))
                        else:
                            raise
        if retry:
            logger.warning(
                "warmup: %d program(s) hit RESOURCE_EXHAUSTED under %d-way "
                "concurrency (transient temp-buffer sum); retrying serially: "
                "%s", len(retry), workers, [label for label, _ in retry])
            for _, fn in retry:
                fn()  # serial OOM = real capacity error -> propagate
        logger.info("warmup matrix: %d programs in %.1fs (%d workers)",
                    len(jobs), time.time() - t0, workers)

    def _prefix_suffix_jobs(self, batch_sizes=None) -> list:
        """Jobs compiling the prefix-variant generate for the overflow-suffix
        buckets: contexts longer than the pool spill their tail into the
        suffix, landing in prompt-size buckets — without this, the first such
        batch pays an XLA compile mid-serving. Default warms the full batch
        bucket only; pass batch_sizes (WARMUP_FULL) for the whole matrix."""
        # WARMUP_OVERFLOW_CAP raises coverage for long-tailed corpora: a
        # p99-gated load sweep must not pay a first-touch compile mid-run
        # (the refprotocol uniform ladder died to exactly that, round 4)
        overflow_cap = int(os.environ.get(
            "WARMUP_OVERFLOW_CAP", "256" if batch_sizes else "192"))
        suffixes = SUFFIX_LEN_BUCKETS + [
            s for s in self.settings.prompt_len_buckets if s <= overflow_cap]
        unwarmed = [s for s in self.settings.prompt_len_buckets
                    if s > overflow_cap]
        if unwarmed:
            # contexts that overflow the pool by a lot ride these buckets —
            # rare (the pool is auto-sized to cover sampled-max contexts)
            # but the first such batch compiles mid-serving
            logger.info("prefix-generate overflow-suffix buckets %s not "
                        "pre-compiled (long-tail contexts only; raise "
                        "WARMUP_FULL coverage if the corpus is long-tailed)",
                        unwarmed)
        jobs = []
        for b in (batch_sizes or [self.batch_buckets[-1]]):
            for s_len in suffixes:
                self._rng, rng = jax.random.split(self._rng)
                jobs.append((f"prefix-generate b{b} s{s_len}",
                             functools.partial(self._warm_prefix_suffix, b,
                                               s_len, rng)))
        return jobs

    def _pool_prefill_jobs(self, batch_sizes, prompt_cap: int) -> list:
        """Warmup jobs for the continuous-mode prefill programs: the pool's
        (b, len) matrix mirrors the fixed path's — cold prompt buckets,
        prefix-suffix buckets, and packed T buckets — but each is a distinct
        XLA program (prefill_for_pool returns KV rows instead of decoding).
        Pure forwards with no pool-state mutation: concurrency-safe."""
        jobs = []
        for b in batch_sizes:
            for plen in self.settings.prompt_len_buckets:
                if plen > prompt_cap:
                    continue
                self._rng, rng = jax.random.split(self._rng)
                jobs.append((f"pool-prefill b{b} p{plen}", functools.partial(
                    self._warm_pool_prefill, b, plen, rng, False)))
        if self.prefix_cache is not None:
            overflow_cap = int(os.environ.get(
                "WARMUP_OVERFLOW_CAP", "256" if batch_sizes else "192"))
            suffixes = SUFFIX_LEN_BUCKETS + [
                s for s in self.settings.prompt_len_buckets
                if s <= overflow_cap]
            for b in batch_sizes:
                for s_len in suffixes:
                    self._rng, rng = jax.random.split(self._rng)
                    jobs.append((f"pool-prefill b{b} s{s_len} +prefix",
                                 functools.partial(self._warm_pool_prefill,
                                                   b, s_len, rng, True)))
        if self.packed:
            for t in self.packed_t_buckets:
                self._rng, rng = jax.random.split(self._rng)
                jobs.append((f"pool-packed t{t}", functools.partial(
                    self._warm_pool_packed, t, rng)))
        return jobs

    def _warm_pool_prefill(self, b: int, plen: int, rng,
                           with_prefix: bool) -> None:
        ids = jnp.zeros((b, plen), jnp.int32)
        mask = jnp.zeros((b, plen), jnp.int32).at[:, -1].set(1)
        prefix_kv = prefix_len = None
        if with_prefix:
            prefix_kv = self.prefix_cache.gather(
                [self.prefix_cache.zero_slot] * b)
            prefix_len = jnp.zeros((b,), jnp.int32)
        prefill_for_pool(self.dec_params, self.dec_cfg, ids, mask, rng,
                         do_sample=self.settings.do_sample, dtype=self.dtype,
                         row_valid=jnp.ones((b,), bool),
                         act_quant=self.act_quant,
                         prefix_kv=prefix_kv, prefix_len=prefix_len,
                         eos_bias=self.settings.eos_bias)

    def _warm_pool_packed(self, t: int, rng) -> None:
        cap = self.batch_buckets[-1]
        ln = max(1, min(self.packed_p, t // cap))
        rows = [[self.dec_tok.pad_id] * ln for _ in range(min(cap, t // ln))]
        _, stream, gather, last, _, _bud = self._stage_packed(rows, len(rows), t)
        _packed_prefill_pool(self.dec_params, self.dec_cfg, stream, gather,
                             last, rng, self.packed_p,
                             self.settings.do_sample, self.dtype,
                             self.act_quant, eos_bias=self.settings.eos_bias)

    def _warm_pool_state(self, batch_sizes, prompt_cap: int) -> None:
        """Serially compile the pool's insert program per reachable (b, T)
        KV-row shape and the (single-shape) decode_chunk program. Warm rows
        are all-invalid (row_valid False), so the pool stays semantically
        empty — only the ring cursor advances, which is position-free."""
        pool = self.decode_pool
        mnt = self.settings.max_new_tokens
        shapes = {(b, plen) for b in batch_sizes
                  for plen in self.settings.prompt_len_buckets
                  if plen <= prompt_cap}
        if self.prefix_cache is not None:
            overflow_cap = int(os.environ.get("WARMUP_OVERFLOW_CAP", "256"))
            pl = self.prefix_cache.pool_len
            shapes |= {(b, pl + s) for b in batch_sizes
                       for s in SUFFIX_LEN_BUCKETS +
                       [x for x in self.settings.prompt_len_buckets
                        if x <= overflow_cap]}
        if self.packed:
            shapes.add((self.batch_buckets[-1], self.packed_p))
        c = self.dec_cfg
        for b, t in sorted(shapes):
            if t + mnt > pool.window:
                continue   # such batches fall back to fixed decode
            pool.warm_insert(
                jnp.zeros((c.num_layers, b, t, c.num_kv_heads, c.head_dim),
                          self.dtype),
                jnp.zeros((b, t), jnp.int32))
        pool.warm_chunk()
        logger.info("decode-pool state programs warmed: %d insert shapes + "
                    "decode_chunk", len(shapes))

    def _warm_prefix_suffix(self, b: int, s_len: int, rng) -> None:
        # gather the permanent zeros slot — same shapes/dtypes/layouts
        # the serving path produces, so the compile cache is hit exactly
        prefix_kv = self.prefix_cache.gather(
            [self.prefix_cache.zero_slot] * b)
        ids = jnp.zeros((b, s_len), jnp.int32)
        mask = jnp.zeros((b, s_len), jnp.int32).at[:, -1].set(1)
        generate(self.dec_params, self.dec_cfg, ids, mask, rng,
                 max_new_tokens=self.settings.max_new_tokens,
                 do_sample=self.settings.do_sample, dtype=self.dtype,
                 row_valid=jnp.ones((b,), bool),
                 act_quant=self.act_quant,
                 prefix_kv=prefix_kv,
                 prefix_len=jnp.zeros((b,), jnp.int32),
                 row_budget=jnp.full((b,), self.settings.max_new_tokens,
                                     jnp.int32),
                 spec_gamma=self.spec_gamma,
                 eos_bias=self.settings.eos_bias)
