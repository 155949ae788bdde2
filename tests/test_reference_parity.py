"""Pin retrieval parity on the reference's REAL SQuAD e5 embeddings.

Skipped when the reference checkout isn't present (CI elsewhere); in this
environment it loads /root/reference/data/squad_embeddings.npy READ-ONLY —
real multilingual-e5-large passage embeddings — and asserts our jnp oracle,
the Pallas kernel, and the 8-device sharded path return top-k index sets
IDENTICAL to an independent numpy implementation of the reference CuPy
retriever's math (reference retriever.py:594-611, 750-769). Exact search on
identical embeddings ⇒ identical recall, the BASELINE.md north star.
"""

import os

import pytest

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DATA, "squad_embeddings.npy")),
    reason="reference data artifacts not available")


def test_topk_index_sets_identical_on_real_squad_embeddings():
    from scripts.reference_parity import run_parity

    report = run_parity(REF_DATA, n_queries=64, k=5)
    assert report["all_identical"], report
    # exact search: self-retrieval recall@1 must be perfect on both sides
    case = report["cases"]["self_retrieval"]
    assert case["recall@1"] == 1.0 and case["ours_recall@1"] == 1.0
    # and recall numbers agree at every noise level
    for name, case in report["cases"].items():
        if "recall@1" in case:
            assert case["recall@1"] == case["ours_recall@1"], name
            assert case["recall@5"] == case["ours_recall@5"], name
