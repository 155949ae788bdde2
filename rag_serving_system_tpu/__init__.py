"""rag_serving_system_tpu — a TPU-native RAG serving framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ngray0/RAG-Serving-System (reference layout: rag_service/):

- ops/       Pallas TPU kernels (fused similarity + streaming top-k) and jnp oracles
- models/    e5 (XLM-RoBERTa-large) encoder + Qwen2.5 decoder as pure-JAX pytrees
- parallel/  device mesh, corpus sharding, distributed exact top-k merge over ICI
- core/      serving engine (jit bucketed pipelines), request queues, batch processor
- api/       FastAPI surface (POST /rag, GET /rag/result/{id}, /health, /metrics)
- utils/     logging / timing / profiling helpers
"""

__version__ = "0.1.0"
