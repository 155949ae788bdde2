"""Retriever classes: the serving-facing wrapper around the top-k ops.

Mirrors the reference's retriever interface
(reference: rag_service/core/retriever.py:615,686):
    retrieve(query_embedding, k) -> list[str]
    batch_retrieve(query_embeddings, ks) -> list[list[str]]

Three implementations, in the same spirit as the reference's trio
(SimpleRetriever / CupyRetriever / TritonKnnRetriever) but TPU-native:

- `SimpleRetriever`  — pure numpy oracle (reference retriever.py:57-166 role)
- `TpuRetriever`     — single-device fused Pallas kernel (jnp oracle on CPU)
- `ShardedRetriever` — corpus sharded over a jax Mesh, exact ICI-merged top-k

All use the reference's fixed-max_k trick for variable per-query k: compute a
fixed compiled max_k, slice per query on host (reference retriever.py:744-790).
Defensive input validation follows the reference's behavior of returning empty
results on malformed input rather than raising (retriever.py:704-732).
"""

from __future__ import annotations

import logging
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rag_serving_system_tpu.ops.topk import cosine_topk
from rag_serving_system_tpu.parallel.mesh import make_mesh
from rag_serving_system_tpu.parallel.sharded_topk import shard_corpus, sharded_cosine_topk

logger = logging.getLogger(__name__)


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class SimpleRetriever:
    """Numpy exact cosine top-k — correctness oracle and CPU fallback."""

    def __init__(self, embeddings: np.ndarray, documents: Sequence[str]):
        self.documents = list(documents)
        self.embeddings = _l2n(np.asarray(embeddings, dtype=np.float32))

    def _validate(self, q: np.ndarray, k: int) -> int:
        if q.ndim != 1 or q.shape[0] != self.embeddings.shape[1]:
            raise ValueError(f"bad query shape {q.shape}")
        return max(1, min(int(k), len(self.documents)))

    def retrieve(self, query_embedding: np.ndarray, k: int = 2) -> List[str]:
        q = _l2n(np.asarray(query_embedding, dtype=np.float32).reshape(-1))
        k = self._validate(q, k)
        sims = self.embeddings @ q
        idx = np.argpartition(-sims, k - 1)[:k]
        idx = idx[np.argsort(-sims[idx], kind="stable")]
        return [self.documents[i] for i in idx]

    def batch_retrieve(self, query_embeddings: np.ndarray,
                       ks: Sequence[int]) -> List[List[str]]:
        return [self.retrieve(q, k) for q, k in zip(np.asarray(query_embeddings), ks)]


class TpuRetriever:
    """Single-device fused similarity+top-k (Pallas on TPU, jnp elsewhere).

    The corpus is resident on device in HBM, pre-normalized once at init
    (analogue of the reference's one-time `cp.asarray` upload, retriever.py:582).
    """

    def __init__(self, embeddings: np.ndarray, documents: Sequence[str],
                 max_k: int = 16, use_pallas: bool | None = None,
                 corpus_dtype: str = "float32"):
        self.documents = list(documents)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        corpus = _l2n(np.asarray(embeddings, dtype=np.float32))
        # bf16 streaming halves the corpus HBM bytes (~2x retrieval speed for
        # large corpora); near-tie orderings can differ from the f32 oracle,
        # so exact-parity deployments keep the default f32
        dt = jnp.bfloat16 if corpus_dtype == "bfloat16" else jnp.float32
        self.corpus = jax.device_put(jnp.asarray(corpus, dtype=dt))
        self.n = corpus.shape[0]
        self.max_k = min(max_k, self.n)

    def topk_indices(self, query_embeddings, k: int):
        """Device path: returns ((B,k) scores, (B,k) indices) jax arrays."""
        q = jnp.asarray(query_embeddings, dtype=jnp.float32)
        return cosine_topk(self.corpus, q, k, use_pallas=self.use_pallas)

    def retrieve(self, query_embedding: np.ndarray, k: int = 2) -> List[str]:
        return self.batch_retrieve(np.asarray(query_embedding)[None, :], [k])[0]

    def batch_retrieve(self, query_embeddings: np.ndarray,
                       ks: Sequence[int]) -> List[List[str]]:
        if len(ks) == 0:
            return []
        q = np.asarray(query_embeddings, dtype=np.float32)
        if q.ndim != 2 or q.shape[1] != self.corpus.shape[1]:
            logger.error("batch_retrieve: bad query shape %s", q.shape)
            return [[] for _ in ks]
        ks = [max(1, min(int(k), self.n)) for k in ks]
        max_k = min(max(max(ks), 1), self.n)
        _, idx = self.topk_indices(q, max_k)
        idx = np.asarray(idx)  # one device→host transfer for the whole batch
        return [[self.documents[i] for i in row[:k]] for row, k in zip(idx, ks)]


class IvfRetriever:
    """Approximate (IVF) retriever for very large corpora — O(C + nprobe*cap)
    rows scanned per query instead of O(N). Same serving interface as the
    exact retrievers; recall controlled by nprobe (nprobe=C ⇒ exact)."""

    def __init__(self, embeddings: np.ndarray, documents: Sequence[str],
                 n_clusters: int = 64, nprobe: int = 8, iters: int = 10,
                 max_k: int = 16):
        from rag_serving_system_tpu.ops.ivf import build_ivf

        self.documents = list(documents)
        corpus = _l2n(np.asarray(embeddings, dtype=np.float32))
        self.n = corpus.shape[0]
        self.nprobe = min(nprobe, n_clusters)
        self.max_k = min(max_k, self.n)
        self.index = build_ivf(corpus, n_clusters=min(n_clusters, self.n),
                               iters=iters)

    def topk_indices(self, query_embeddings, k: int):
        from rag_serving_system_tpu.ops.ivf import ivf_search

        q = jnp.asarray(query_embeddings, dtype=jnp.float32)
        return ivf_search(self.index, q, k, nprobe=self.nprobe)

    def retrieve(self, query_embedding: np.ndarray, k: int = 2) -> List[str]:
        return self.batch_retrieve(np.asarray(query_embedding)[None, :], [k])[0]

    def batch_retrieve(self, query_embeddings: np.ndarray,
                       ks: Sequence[int]) -> List[List[str]]:
        if len(ks) == 0:
            return []
        q = np.asarray(query_embeddings, dtype=np.float32)
        if q.ndim != 2 or q.shape[1] != self.index.centroids.shape[1]:
            logger.error("batch_retrieve: bad query shape %s", q.shape)
            return [[] for _ in ks]
        ks = [max(1, min(int(k), self.n)) for k in ks]
        max_k = min(max(ks), self.n)
        _, idx = self.topk_indices(q, max_k)
        idx = np.asarray(idx)
        return [[self.documents[i] for i in row[:k] if i >= 0]
                for row, k in zip(idx, ks)]


class ShardedRetriever:
    """Corpus sharded on N over a jax Mesh; exact top-k with ICI merge."""

    def __init__(self, embeddings: np.ndarray, documents: Sequence[str],
                 mesh=None, max_k: int = 16, use_pallas: bool | None = None):
        self.documents = list(documents)
        self.mesh = mesh if mesh is not None else make_mesh()
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        corpus = _l2n(np.asarray(embeddings, dtype=np.float32))
        self.n = corpus.shape[0]
        self.max_k = min(max_k, self.n)
        self.corpus = shard_corpus(jnp.asarray(corpus), self.mesh)

    def topk_indices(self, query_embeddings, k: int):
        q = jnp.asarray(query_embeddings, dtype=jnp.float32)
        return sharded_cosine_topk(self.corpus, q, k, self.mesh,
                                   valid_n=self.n, use_pallas=self.use_pallas)

    def retrieve(self, query_embedding: np.ndarray, k: int = 2) -> List[str]:
        return self.batch_retrieve(np.asarray(query_embedding)[None, :], [k])[0]

    def batch_retrieve(self, query_embeddings: np.ndarray,
                       ks: Sequence[int]) -> List[List[str]]:
        if len(ks) == 0:
            return []
        q = np.asarray(query_embeddings, dtype=np.float32)
        if q.ndim != 2 or q.shape[1] != self.corpus.shape[1]:
            logger.error("batch_retrieve: bad query shape %s", q.shape)
            return [[] for _ in ks]
        ks = [max(1, min(int(k), self.n)) for k in ks]
        max_k = min(max(max(ks), 1), self.n)
        _, idx = self.topk_indices(q, max_k)
        idx = np.asarray(idx)
        return [[self.documents[i] for i in row[:k]] for row, k in zip(idx, ks)]
