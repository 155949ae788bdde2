"""End-to-end RagEngine over a multi-device mesh (8 virtual CPU devices):
exercises the engine's sharded-retrieval branch + TP-shardable params path
that production v5e-8 serving uses."""

import numpy as np
import pytest

import jax

from rag_serving_system_tpu.config import Settings
from rag_serving_system_tpu.core.engine import RagEngine
from rag_serving_system_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def sharded_engine():
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(0)
    docs = [f"Fact {i}: the answer to question {i} is {i * i}." for i in range(64)]
    emb = rng.standard_normal((64, 64)).astype(np.float32)
    settings = Settings(model_preset="tiny", dtype="float32",
                        batch_buckets=[1, 4], encode_len_buckets=[16, 32],
                        prompt_len_buckets=[64], max_new_tokens=3, max_k=4,
                        mesh_shape="4,2")
    mesh = make_mesh("4,2")
    return RagEngine(settings, docs, emb, mesh=mesh)


def test_sharded_engine_process(sharded_engine):
    results = sharded_engine.process(["what is 4 times 4?", "and 5?"], [2, 3])
    assert len(results) == 2
    assert all("result" in r for r in results)


def test_sharded_retrieval_matches_unsharded(sharded_engine):
    """The mesh path must retrieve exactly the same documents as the
    single-device path for identical inputs."""
    rng = np.random.default_rng(1)
    docs = sharded_engine.documents
    emb = np.asarray(jax.device_get(sharded_engine.corpus))[:64]  # unpadded rows
    single = RagEngine(
        Settings(model_preset="tiny", dtype="float32", batch_buckets=[1, 4],
                 encode_len_buckets=[16, 32], prompt_len_buckets=[64],
                 max_new_tokens=3, max_k=4),
        docs, emb)
    queries = ["what is the answer to question 7?", "question 13?"]
    assert (sharded_engine.embed_and_retrieve(queries, [3, 4])
            == single.embed_and_retrieve(queries, [3, 4]))


def test_sharded_topk_exact_with_padding_and_negative_sims():
    """Zero-padded corpus rows score 0 and could displace real rows with
    NEGATIVE cosine similarity from a shard's local top-k; the widened
    per-shard selection must keep the global result exact (advisor finding,
    round 1)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from rag_serving_system_tpu.ops.topk import cosine_topk_reference
    from rag_serving_system_tpu.parallel.sharded_topk import (
        shard_corpus, sharded_cosine_topk)

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2),
                axis_names=("data", "model"))
    rng = np.random.default_rng(7)
    for n, k in [(100, 5), (5, 5), (13, 3), (130, 16)]:
        d = 64
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
        # queries anti-aligned with the corpus → mostly negative similarities
        queries = -corpus[:3] + 0.01 * rng.standard_normal((3, d)).astype(np.float32)
        kk = min(k, n)
        cs = shard_corpus(jnp.asarray(corpus), mesh)
        s, i = sharded_cosine_topk(cs, jnp.asarray(queries), kk, mesh, valid_n=n)
        s_ref, i_ref = cosine_topk_reference(jnp.asarray(corpus),
                                             jnp.asarray(queries), kk)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref),
                                      err_msg=f"n={n} k={kk}")
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   atol=1e-5, err_msg=f"n={n} k={kk}")


def test_sharded_generation_value_parity(sharded_engine):
    """Greedy tokens from the dp x tp mesh engine must EQUAL the 1-device
    engine's for identical weights/corpus/seed — catches replication and
    collective-placement bugs that shape tests cannot."""
    from rag_serving_system_tpu.config import Settings
    import dataclasses

    greedy = dataclasses.replace(
        Settings(model_preset="tiny", dtype="float32", batch_buckets=[1, 4],
                 encode_len_buckets=[16, 32], prompt_len_buckets=[64],
                 max_new_tokens=3, max_k=4),
        do_sample=False)
    docs = sharded_engine.documents
    emb = np.asarray(jax.device_get(sharded_engine.corpus))[:64]
    mesh = make_mesh("4,2")
    queries = ["what is 4 times 4?", "and question 11?"]
    res_mesh = RagEngine(greedy, docs, emb, mesh=mesh).process(queries, [2, 2])
    res_single = RagEngine(greedy, docs, emb).process(queries, [2, 2])
    assert res_mesh == res_single


@pytest.mark.parametrize("shape", ["8,1", "2,4", "1,8"])
def test_mesh_shape_variety_value_parity(shape):
    """Retrieval indices must be identical to single-device across mesh
    shapes: pure-dp (8,1), tp-heavy (2,4), and pure-tp (1,8) — catches
    axis-size assumptions in the sharding rules and the top-k merge."""
    from rag_serving_system_tpu.config import Settings

    rng = np.random.default_rng(3)
    docs = [f"Fact {i}: item {i} equals {i + 1}." for i in range(50)]
    emb = rng.standard_normal((50, 64)).astype(np.float32)
    settings = Settings(model_preset="tiny", dtype="float32",
                        batch_buckets=[2], max_batch_size=2,
                        encode_len_buckets=[16], prompt_len_buckets=[64],
                        max_new_tokens=2, max_k=4, do_sample=False)
    queries = ["what does item 7 equal?", "item 13?"]
    mesh_engine = RagEngine(settings, docs, emb, mesh=make_mesh(shape))
    single = RagEngine(settings, docs, emb)
    assert (mesh_engine.embed_and_retrieve(queries, [3, 4])
            == single.embed_and_retrieve(queries, [3, 4]))
    assert mesh_engine.process(queries, [2, 2]) == single.process(queries, [2, 2])


@pytest.mark.parametrize("qw", ["int8", "int4"])
def test_sharded_engine_with_quantized_weights(qw):
    """TP sharding rules must map QuantizedWeight (2-D int8) and
    QuantizedWeight4 (3-D grouped packed int4) leaves onto the mesh — the
    int4 leaves shard the output axis (col) / group axis (row) and the
    engine must still serve end-to-end."""
    rng = np.random.default_rng(2)
    docs = [f"Doc {i} content." for i in range(32)]
    emb = rng.standard_normal((32, 64)).astype(np.float32)
    settings = Settings(model_preset="tiny", dtype="float32",
                        batch_buckets=[2], max_batch_size=2,
                        encode_len_buckets=[16], prompt_len_buckets=[64],
                        max_new_tokens=2, max_k=4,
                        mesh_shape="4,2", quant_weights=qw)
    engine = RagEngine(settings, docs, emb, mesh=make_mesh("4,2"))
    results = engine.process(["what is doc 3?", "doc 7?"], [2, 2])
    assert len(results) == 2 and all("result" in r for r in results)


def test_sharded_prefix_cache_value_parity():
    """The prefix-KV cache now runs UNDER THE MESH (TP-sharded value pool,
    core/prefix_cache.py): greedy output with the sharded cache — miss pass
    AND hit pass — must equal the single-device engine's, and the cache must
    actually have engaged (entries + hits), not silently bypassed."""
    from rag_serving_system_tpu.config import Settings

    rng = np.random.default_rng(5)
    # long docs so the context prefix clears min_tokens and lands in the pool
    docs = [f"Document {i}. " + " ".join(f"d{i}w{j}" for j in range(24))
            for i in range(32)]
    emb = rng.standard_normal((32, 64)).astype(np.float32)
    settings = Settings(model_preset="tiny", dtype="float32",
                        batch_buckets=[2], max_batch_size=2,
                        encode_len_buckets=[16], prompt_len_buckets=[64],
                        max_new_tokens=3, max_k=4, do_sample=False,
                        prefix_pool_len=48)
    queries = ["what is document 7 about?", "document 13?"]
    mesh_engine = RagEngine(settings, docs, emb, mesh=make_mesh("4,2"))
    single = RagEngine(settings, docs, emb)
    assert mesh_engine.prefix_cache is not None, "cache off under mesh"
    r_single = single.process(queries, [2, 2])
    r_miss = mesh_engine.process(queries, [2, 2])   # cold: insert path
    r_hit = mesh_engine.process(queries, [2, 2])    # warm: gather-hit path
    assert r_miss == r_single and r_hit == r_single
    st = mesh_engine.prefix_cache.stats()
    assert st["entries"] > 0 and st["hits"] > 0, st
    # the pool really is sharded over the mesh (not replicated):
    pool = mesh_engine.prefix_cache._pool
    assert len(pool.sharding.device_set) == 8
    shard_bytes = pool.addressable_shards[0].data.nbytes
    assert shard_bytes * 2 <= pool.nbytes, (shard_bytes, pool.nbytes)
