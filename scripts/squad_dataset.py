"""Build the SQuAD-1000 corpus artifacts (reference: scripts/squad_dataset.py).

Pipeline: load `squad` train[:20000] via HF datasets, dedupe contexts, sample
1000 with seed 42, keep one question per context, embed with the JAX e5
encoder ("passage: " prefix, mean-pool, L2-normalize) → data/squad_*.json +
data/squad_embeddings.npy (1000, hidden) f32.

Offline fallback (no HF hub access): a deterministic synthetic corpus of
1000 paragraph/question pairs with SQuAD-like lengths, so downstream
benchmarks and tests have a corpus of the right scale either way.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.fact_dataset import get_passage_embeddings  # noqa: E402

N_DOCS = 1000
SEED = 42


def load_squad_pairs():
    """Real SQuAD sample when the hub is reachable; else None."""
    try:
        from datasets import load_dataset

        ds = load_dataset("squad", split="train[:20000]")
        seen = {}
        for row in ds:
            ctx = row["context"]
            if ctx not in seen:
                seen[ctx] = row["question"]
        contexts = list(seen.keys())
        rng = np.random.default_rng(SEED)
        pick = rng.choice(len(contexts), size=N_DOCS, replace=False)
        return [{"context": contexts[i], "query": seen[contexts[i]]} for i in pick]
    except Exception as e:
        print(f"HF datasets unavailable ({type(e).__name__}); using synthetic corpus")
        return None


_TOPICS = ["the river delta", "a medieval trade guild", "volcanic basalt",
           "a migratory songbird", "an early steam engine", "a coral atoll",
           "a desert aquifer", "a printing workshop", "a mountain railway",
           "a coastal lighthouse", "an ancient aqueduct", "a glacier field"]


def synthetic_pairs():
    rng = np.random.default_rng(SEED)
    pairs = []
    for i in range(N_DOCS):
        topic = _TOPICS[i % len(_TOPICS)]
        n1, n2, n3 = rng.integers(2, 900, size=3)
        ctx = (f"Article {i}. Researchers studying {topic} documented {n1} distinct "
               f"features over {n2} seasons of observation. The project, launched in "
               f"19{50 + i % 50}, catalogued measurements at {n3} sites and concluded "
               f"that the structure of {topic} changes gradually under sustained "
               f"environmental pressure. Field notes describe the methodology in "
               f"detail, including sampling intervals, calibration of instruments, "
               f"and the statistical models used to validate the findings.")
        q = f"How many sites were measured in the study of {topic} in article {i}?"
        pairs.append({"context": ctx, "query": q})
    return pairs


def main(out_dir: str = "data") -> None:
    os.makedirs(out_dir, exist_ok=True)
    pairs = load_squad_pairs() or synthetic_pairs()
    contexts = [p["context"] for p in pairs]
    queries = [p["query"] for p in pairs]

    with open(os.path.join(out_dir, "squad_contexts.json"), "w") as f:
        json.dump(contexts, f)
    with open(os.path.join(out_dir, "squad_queries.json"), "w") as f:
        json.dump(queries, f)
    with open(os.path.join(out_dir, "squad_pairs.json"), "w") as f:
        json.dump(pairs, f)

    emb = get_passage_embeddings(contexts, batch_size=32)
    np.save(os.path.join(out_dir, "squad_embeddings.npy"), emb)
    print(f"wrote {len(contexts)} contexts/queries/pairs + embeddings {emb.shape}")


if __name__ == "__main__":
    main()
