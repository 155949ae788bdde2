"""Composition root (reference: main.py:15-76).

Wires: Settings → data → engine (models + device corpus) → queue backend
(Redis iff REDIS_URL, reference main.py:35-49) → BatchProcessor thread →
FastAPI app → uvicorn.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
)
logger = logging.getLogger("main")


def build_app(settings=None, warmup: bool = True):
    """Build (app, processor, engine) — separated from main() for tests."""
    from rag_serving_system_tpu.config import get_settings
    from rag_serving_system_tpu.core.engine import RagEngine
    from rag_serving_system_tpu.core.batch_processor import BatchProcessor
    from rag_serving_system_tpu.core.request_queue import make_queue
    from rag_serving_system_tpu.api.endpoints import create_api
    from rag_serving_system_tpu.parallel.mesh import make_mesh

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    settings = settings or get_settings()

    if settings.platform:
        # must run before any backend is initialized; wins over plugin
        # force-selection (env JAX_PLATFORMS can be overridden by plugins,
        # the config update cannot)
        try:
            jax.config.update("jax_platforms", settings.platform)
        except RuntimeError as e:
            logger.warning("JAX_SERVE_PLATFORM=%s ignored (backend already "
                           "initialized): %s", settings.platform, e)

    logger.info("loading corpus: %s", settings.document_text_file)
    with open(settings.document_text_file, "r", encoding="utf-8") as f:
        documents = json.load(f)
    doc_embeddings = np.load(settings.document_embeddings_file)
    logger.info("corpus: %d docs, embeddings %s", len(documents), doc_embeddings.shape)

    n_dev = len(jax.devices())
    mesh = make_mesh(settings.mesh_shape) if n_dev > 1 else None
    if mesh is not None:
        logger.info("mesh: %s over %d devices", dict(mesh.shape), n_dev)

    engine = RagEngine(settings, documents, doc_embeddings, mesh=mesh)
    if warmup:
        # compile EVERY batch bucket up front: at low traffic the batch
        # former produces in-between sizes (2, 4, ...), and an XLA compile
        # landing on a live request means a 60 s latency spike (observed as
        # a false p99-gate hit in the first load sweeps). The persistent
        # compile cache makes this cheap on restarts.
        logger.info("warming up compiled buckets %s...", engine.batch_buckets)
        engine.warmup(engine.batch_buckets)

    request_queue = make_queue(settings)
    logger.info("queue backend: %s", type(request_queue).__name__)

    processor = BatchProcessor(request_queue, engine,
                               polling_interval=min(settings.polling_interval, 0.05))
    processor.start()

    app = create_api(request_queue, processor, engine,
                     max_queue_size=int(os.environ.get("MAX_QUEUE_SIZE", "0")))
    return app, processor, engine, settings


def main():
    from rag_serving_system_tpu.api.endpoints import run_app

    app, processor, _, settings = build_app()
    try:
        # aiohttp's run_app handles SIGTERM/SIGINT itself and returns
        run_app(app, host=settings.host, port=settings.port)
    finally:
        # K8s sends SIGTERM before killing the pod: drain the in-flight
        # batch (plus one prefetched batch) so accepted requests get their
        # results delivered before exit. Requests still in the queue
        # survive in Redis for the replacement replica.
        logger.info("draining in-flight work before exit...")
        processor.stop(drain_timeout=float(os.environ.get("DRAIN_TIMEOUT", "30")))


if __name__ == "__main__":
    main()
