"""Retrieval-kernel roofline decomposition (VERDICT r2 #6).

Round 2 measured the fused cosine-top-k at 23.7 ms for 1M f32 docs
(~173 GB/s) against a measured ~475 GB/s HBM streaming ceiling, and HYPOTHESIZED
the gap was the f32 HIGHEST-precision MXU passes. This script separates the
costs with kernel variants over the same grid/BlockSpecs:

  stream   — DMA only: per-block max-reduce, no matmul, no merge
  dot      — matmul only: block GEMM into a scratch accumulator, no merge
  full     — the real kernel (cosine_topk_pallas)

run for f32 and bf16 corpora at several block sizes, timed by CHAINED
dispatches with one host sync (the axon tunnel's block_until_ready is a
no-op and each host sync costs ~26 ms — see utils/timing.py).

Prints one JSON line per config with achieved GB/s.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stream_kernel(c_ref, out_ref, acc, *, _):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # one vector reduce per block: forces the DMA, ~zero compute
    acc[:] = acc[:] + jnp.max(c_ref[:], axis=0, keepdims=True)

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        out_ref[:] = acc[:]


def _dot_kernel(q_ref, c_ref, out_ref, acc, *, precision):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # fold the (B, BLOCK_N) tile to (B, 128) so the accumulator is small but
    # the matmul result is fully consumed
    b, bn = s.shape
    acc[:] = acc[:] + jnp.sum(s.reshape(b, bn // 128, 128), axis=1)

    @pl.when(step == pl.num_programs(0) - 1)
    def _emit():
        out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("block_n", "variant", "highest"))
def _run_variant(corpus, queries, block_n: int, variant: str, highest: bool):
    n, d = corpus.shape
    b = queries.shape[0]
    nsteps = n // block_n
    if variant == "stream":
        kern = functools.partial(_stream_kernel, _=None)
        return pl.pallas_call(
            kern, grid=(nsteps,),
            in_specs=[pl.BlockSpec((block_n, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, d), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, d), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        )(corpus)
    precision = (jax.lax.Precision.HIGHEST
                 if highest and corpus.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kern = functools.partial(_dot_kernel, precision=precision)
    return pl.pallas_call(
        kern, grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, 128), jnp.float32)],
    )(queries.astype(corpus.dtype), corpus)


def timed(fn, reps: int = 8) -> float:
    """Chained dispatches, one host sync (axon: block_until_ready no-ops)."""
    out = fn()
    np.asarray(jax.device_get(out))[:1]  # warm + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.device_get(out))[:1]
    return (time.time() - t0) / reps


def run_int8(base: np.ndarray, queries, results: list) -> None:
    """int8-corpus rows: the kernel streams N*D bytes + N*4 scale bytes.

    Quantizes HOST-side (numpy) — the jitted quantize_corpus_int8 holds
    ~3 corpus-sized f32 transients on device, which OOMs next to the 1M
    f32/bf16 corpora the fp sweep leaves resident."""
    from rag_serving_system_tpu.ops.topk import cosine_topk_pallas_int8

    n, d = base.shape
    k = 16
    mean = base.mean(axis=0, keepdims=True)
    r = base - mean
    scale = np.maximum(np.abs(r).max(axis=1, keepdims=True), 1e-12) / 127.0
    qv = np.clip(np.round(r / scale), -127, 127).astype(np.int8)
    cq = jax.device_put(jnp.asarray(qv))
    cs = jax.device_put(jnp.asarray(scale.reshape(1, -1)))
    cm = jax.device_put(jnp.asarray(mean))
    nbytes = n * d + n * 4
    # the kernel's VMEM budget clamps block_n to ~4096 rows at d=1024
    for block_n in (2048, 4096):
        if n % block_n:
            continue
        try:
            fn = lambda: cosine_topk_pallas_int8(  # noqa: E731
                cq, cs, queries, k, corpus_mean=cm, block_n=block_n)[0]
            dt = timed(fn)
            row = {"corpus": "int8", "variant": "full", "block_n": block_n,
                   "n": n, "ms": round(dt * 1e3, 2),
                   "gbps": round(nbytes / dt / 1e9, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"corpus": "int8", "block_n": block_n,
                              "n": n, "error": str(e)[:200]}), flush=True)


def run_int8_10m(d: int, queries, results: list) -> None:
    """10M-doc row (VERDICT r2 #6): 10M x 1024 only fits one chip's HBM as
    int8 (10.2 GB vs 20.5 bf16 / 41 f32), and must run CHUNKED — the
    compiler rejects the one-array kernel past N x block_n ~ 2^35.
    Synthetic int8 corpus generated host-side; timing is data-independent
    for the streaming scan."""
    from rag_serving_system_tpu.ops.topk import cosine_topk_int8_chunked

    n, chunk = 10_000_000, 4_194_304
    rng = np.random.default_rng(1)
    chunks = []
    for lo in range(0, n, chunk):
        rows = min(chunk, n - lo)
        chunks.append((
            jax.device_put(jnp.asarray(
                rng.integers(-127, 128, size=(rows, d), dtype=np.int8))),
            jax.device_put(jnp.full((1, rows), 1 / 127.0, dtype=jnp.float32)),
        ))
    nbytes = n * d + n * 4
    try:
        fn = lambda: cosine_topk_int8_chunked(chunks, queries, 16)[0]  # noqa: E731
        dt = timed(fn, reps=4)
        row = {"corpus": "int8", "variant": "chunked", "n": n,
               "chunks": len(chunks), "ms": round(dt * 1e3, 2),
               "gbps": round(nbytes / dt / 1e9, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"corpus": "int8_10m", "error": str(e)[:200]}),
              flush=True)


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    n = int(os.environ.get("TOPK_N", str(1 << 20)))
    d, b, k = 1024, 32, 16
    rng = np.random.default_rng(0)
    base = rng.standard_normal((n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    queries = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))

    from rag_serving_system_tpu.ops.topk import cosine_topk_pallas

    results = []
    corpus = None
    # TOPK_PARTS selects sections (fp = f32/bf16 roofline, int8 = 1M int8,
    # 10m = the 10M-doc row). The 10M row needs a FRESH process: HBM
    # fragmentation from the fp sweep's 6 GB of corpora breaks the 10 GB
    # device_put even after del.
    parts = os.environ.get("TOPK_PARTS", "fp,int8").split(",")
    for dtype, name in (((jnp.float32, "f32"), (jnp.bfloat16, "bf16"))
                        if "fp" in parts else ()):
        corpus = jnp.asarray(base, dtype=dtype)
        nbytes = n * d * (4 if name == "f32" else 2)
        for block_n in (512, 1024, 2048, 4096):
            if block_n * d * (4 if name == "f32" else 2) * 2 > 12_000_000:
                continue
            if n % block_n:
                continue
            for variant in ("stream", "dot", "full"):
                for highest in ((False, True) if (variant == "dot" and
                                                  name == "f32") else (False,)):
                    try:
                        if variant == "full":
                            fn = lambda: cosine_topk_pallas(  # noqa: E731
                                corpus, queries, k, block_n=block_n)[0]
                        else:
                            fn = lambda: _run_variant(  # noqa: E731
                                corpus, queries, block_n, variant, highest)
                        dt = timed(fn)
                        row = {"corpus": name, "variant": variant,
                               "block_n": block_n,
                               "highest": bool(highest),
                               "ms": round(dt * 1e3, 2),
                               "gbps": round(nbytes / dt / 1e9, 1)}
                        results.append(row)
                        print(json.dumps(row), flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(json.dumps({"corpus": name, "variant": variant,
                                          "block_n": block_n,
                                          "error": str(e)[:200]}), flush=True)
    if "int8" in parts:
        run_int8(base, queries, results)
    del base, corpus
    if "10m" in parts:
        run_int8_10m(d, queries, results)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
