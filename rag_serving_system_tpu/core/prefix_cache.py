"""Exact prefix-KV cache: content-addressed reuse of context KV across requests.

The RAG prompt is "Context:\n{docs}\n\nQuestion: {q}..." (reference:
rag_service/core/batch_processor.py:100-103) and retrieval is deterministic
exact top-k — so the (usually long) context prefix repeats across requests
whenever queries repeat or share retrieved documents. Prefill is the
compute-bound stage (it runs at the chip's int8 matmul ceiling; see
PERFORMANCE.md), which makes *not recomputing* the context KV the only lever
left past the hardware roofline. This is the TPU-shaped equivalent of
vLLM-style automatic prefix caching:

- entries are whole context prefixes (keyed by retrieved-doc identity,
  VERIFIED against exact token ids — a hit is bit-exact by construction, not
  probabilistic);
- each entry's payload is one fixed-shape device array
  (L, 2, POOL_LEN, Hk, D), produced by `models.qwen2.compute_prefix_kv` with
  RoPE positions 0..n-1, so it is position-exact for any prompt that starts
  with those tokens (XLA needs static shapes — a paged/token-granular pool
  would fight the compiler for nothing at this prompt scale);
- a batch's entries are stacked into (B, L, 2, POOL_LEN, Hk, D) and handed to
  `generate(prefix_kv=...)`, which prefills only the suffix (question +
  answer cue) and attends over [prefix | suffix | generated];
- misses are DEDUPLICATED per batch and computed in one batched
  `compute_prefix_kv` dispatch — so even at 0% hit rate the prefix tokens
  are prefilled once per distinct context instead of once per row.

Memory is bounded by an LRU over a byte budget; eviction is safe against
in-flight batches because entries are independent device arrays — an evicted
entry's buffer lives until the last dispatched computation referencing it
completes (no shared pool tensor, no donation hazards).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from dataclasses import dataclass
from typing import Hashable, Optional, Tuple

import jax


@dataclass
class PrefixEntry:
    tokens: Tuple[int, ...]   # exact token ids this entry caches
    kv: jax.Array             # (L, 2, POOL_LEN, Hk, D) device array


class PrefixKVCache:
    """Host-side LRU of context-prefix KV entries (device-resident payloads).

    Thread-safe: lookups may run on the prefetch thread while inserts run on
    the dispatch thread. A hit requires the stored token ids to equal the
    request's prefix tokens — the key (retrieved-doc tuple) is only a fast
    index; exactness never depends on it (tokenizers can merge across the
    context/question boundary, which the caller handles by trimming, and the
    verify here backstops)."""

    def __init__(self, pool_len: int, entry_bytes: int, budget_mb: int = 2048,
                 min_tokens: int = 16):
        self.pool_len = int(pool_len)
        self.entry_bytes = int(entry_bytes)
        self.capacity = max(1, (budget_mb * (1 << 20)) // max(1, entry_bytes))
        self.min_tokens = min_tokens
        self._entries: "OrderedDict[Hashable, PrefixEntry]" = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0
        self.bypassed = 0  # rows that skipped the prefix path entirely

    def get(self, key: Hashable, tokens: Tuple[int, ...]) -> Optional[PrefixEntry]:
        with self._lock:
            e = self._entries.get(key)
            if e is not None and e.tokens == tokens:
                self._entries.move_to_end(key)
                self.hits += 1
                return e
            self.misses += 1
            return None

    def put(self, key: Hashable, tokens: Tuple[int, ...], kv: jax.Array) -> PrefixEntry:
        e = PrefixEntry(tokens=tuple(tokens), kv=kv)
        with self._lock:
            self._entries[key] = e
            self._entries.move_to_end(key)
            while len(self._entries) > self.capacity:
                self._entries.popitem(last=False)  # LRU; buffer freed when
                # the last in-flight computation referencing it completes
        return e

    def __len__(self) -> int:
        return len(self._entries)

    def stats(self) -> dict:
        with self._lock:
            lookups = self.hits + self.misses
            return {
                "entries": len(self._entries),
                "capacity": self.capacity,
                "bytes": len(self._entries) * self.entry_bytes,
                "hits": self.hits,
                "misses": self.misses,
                "bypassed": self.bypassed,
                "hit_rate": (self.hits / lookups) if lookups else 0.0,
            }


class PromptSpec(str):
    """A prompt string that carries its cacheable-prefix split.

    Subclassing `str` keeps every existing consumer working unchanged
    (tokenizers encode it, `len()` orders it for length-aware batching, tests
    compare it) while the engine's staging path can read the extra fields."""

    prefix_text: str
    cache_key: Hashable
    sort_len: int

    def __new__(cls, text: str, prefix_text: str = "", cache_key=None):
        s = super().__new__(cls, text)
        s.prefix_text = prefix_text
        s.cache_key = cache_key
        # length-aware batch regrouping should order by what actually sets
        # the prefill bucket: the SUFFIX (the prefix is cached KV)
        s.sort_len = max(len(text) - len(prefix_text), 0)
        return s


def split_prefix_tokens(full_tokens: list, prefix_tokens: list,
                        max_len: int) -> int:
    """Longest m <= max_len with full_tokens[:m] == prefix_tokens[:m].

    BPE tokenizers can merge across the prefix/suffix string boundary, so the
    last token (or two) of the separately-tokenized prefix may differ from
    the full prompt's tokenization — trim until they agree. Exactness of the
    cached prefill only needs *some* token-aligned split point."""
    m = min(len(prefix_tokens), len(full_tokens), max_len)
    while m > 0 and full_tokens[m - 1] != prefix_tokens[m - 1]:
        m -= 1
    # the trimmed region must match element-wise, not just at the last index
    while m > 0 and full_tokens[:m] != prefix_tokens[:m]:
        m -= 1
    return m
