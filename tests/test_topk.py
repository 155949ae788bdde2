"""Pallas fused top-k vs jnp oracle vs numpy (exactness tests).

Mirrors the validation role the reference's SimpleRetriever plays for its GPU
paths (reference: rag_service/core/retriever.py:57-166)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rag_serving_system_tpu.ops.topk import (
    cosine_topk_reference,
    cosine_topk_pallas,
)


def _numpy_cosine_topk(corpus, queries, k):
    q = queries / np.maximum(np.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    sims = q @ corpus.T
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(sims, idx, axis=1)
    return scores, idx


def _make(rng, n, d, b):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    return corpus, queries


@pytest.mark.parametrize("n,d,b,k", [(100, 64, 4, 5), (1000, 128, 8, 10), (257, 256, 1, 3)])
def test_reference_matches_numpy(rng, n, d, b, k):
    corpus, queries = _make(rng, n, d, b)
    scores, idx = cosine_topk_reference(jnp.asarray(corpus), jnp.asarray(queries), k)
    np_scores, np_idx = _numpy_cosine_topk(corpus, queries, k)
    np.testing.assert_allclose(np.asarray(scores), np_scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np_idx)


@pytest.mark.parametrize("n,d,b,k,block_n", [
    (100, 128, 4, 5, 128),      # tiny corpus, padding within one block
    (1000, 128, 8, 10, 256),    # multi-block with tail padding
    (512, 256, 2, 16, 128),     # k larger than usual
    (300, 128, 32, 5, 128),     # full serving batch
])
def test_pallas_matches_oracle(rng, n, d, b, k, block_n):
    corpus, queries = _make(rng, n, d, b)
    ref_s, ref_i = cosine_topk_reference(jnp.asarray(corpus), jnp.asarray(queries), k)
    s, i = cosine_topk_pallas(
        jnp.asarray(corpus), jnp.asarray(queries), k, block_n=block_n, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_pallas_ties_resolve_to_lowest_index(rng):
    # duplicate rows → tied scores; kernel must pick the earliest index,
    # matching lax.top_k / argsort(stable) semantics.
    d = 128
    base = rng.standard_normal((1, d)).astype(np.float32)
    corpus = np.repeat(base, 6, axis=0)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = base.copy()
    s, i = cosine_topk_pallas(jnp.asarray(corpus), jnp.asarray(queries), 3,
                              block_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i)[0], [0, 1, 2])


def test_unnormalized_queries_ok(rng):
    corpus, queries = _make(rng, 200, 128, 4)
    queries *= 7.5  # scale must not change cosine ranking
    ref_s, ref_i = cosine_topk_reference(jnp.asarray(corpus), jnp.asarray(queries), 5)
    s, i = cosine_topk_pallas(jnp.asarray(corpus), jnp.asarray(queries), 5,
                              block_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_pallas_bf16_corpus_matches_bf16_oracle():
    """bf16 corpus streaming: the kernel must produce the same top-k as the
    f32 oracle evaluated on the bf16-cast corpus (values identical up to
    f32 accumulation order)."""
    rng = np.random.default_rng(11)
    corpus = rng.standard_normal((300, 128)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.standard_normal((4, 128)).astype(np.float32)
    c_bf = jnp.asarray(corpus, dtype=jnp.bfloat16)
    s, i = cosine_topk_pallas(c_bf, jnp.asarray(queries), 5, interpret=True)
    s_ref, i_ref = cosine_topk_reference(
        c_bf.astype(jnp.float32), jnp.asarray(queries), 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-3)


def test_topk_large_query_batch_shrinks_block(rng):
    """Large B must shrink the corpus block (B-dependent VMEM buffers grow
    with the batch) and stay oracle-exact — previously the block budget
    ignored B and Mosaic could exceed scoped VMEM at serve time."""
    from rag_serving_system_tpu.ops.topk import (
        cosine_topk_pallas,
        cosine_topk_reference,
    )

    corpus = rng.standard_normal((700, 256)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng.standard_normal((512, 256)).astype(np.float32)
    got_s, got_i = cosine_topk_pallas(jnp.asarray(corpus), jnp.asarray(queries),
                                      k=8, interpret=True)
    ref_s, ref_i = cosine_topk_reference(jnp.asarray(corpus),
                                         jnp.asarray(queries), k=8)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
