"""Chip-ceiling hunt for the cold (no-prefix-cache) prefill path.

VERDICT r3 #1: the `_noprefix` squad_real row is 126.9 req/s vs the 237
north-star; the batch-32 x 448-token prefill is ~37 TFLOP and the round-2
int8 ceiling measurement said 171 TOP/s — which would put the target out of
physical reach. Before optimizing, re-measure the ceiling ON THE ACTUAL
PREFILL SHAPES (the round-2 probe used one (6k,1.5k)@(1.5k,9k) shape).

Timing discipline: the axon tunnel adds ~26 ms per host sync AND ~10 ms per
dispatched program (measured by the first version of this script: every
shape bottomed out at 10 ms wall regardless of FLOPs). So the repeat loop
runs INSIDE one XLA program via lax.fori_loop with a true data dependency
(one element of the output folded back into the operand); the program is
dispatched once and synced once via a tiny transfer.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = int(os.environ.get("CEIL_REPS", "16"))


def _dep_fold(a, out):
    """Fold one output element back into a[0,0] — a real data dependency the
    compiler cannot elide, costing one element write per iteration."""
    v = out[0, 0].astype(jnp.float32) * 1e-30  # ~0 but data-dependent
    upd = (a[0:1, 0:1].astype(jnp.float32) + v).astype(a.dtype)
    return jax.lax.dynamic_update_slice(a, upd, (0, 0))


@functools.partial(jax.jit, static_argnames=("reps", "pet"))
def _mm_loop(a, b, reps, pet):
    def body(_, a):
        out = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                  preferred_element_type=pet)
        return _dep_fold(a, out)
    a = jax.lax.fori_loop(0, reps, body, a)
    return a[0, 0]


def bench_matmul(m, k, n, dtype, reps=REPS):
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        pet = jnp.int32
    else:
        a = (jax.random.normal(key, (m, k), jnp.float32) * 0.1).astype(jnp.bfloat16)
        b = (jax.random.normal(key, (k, n), jnp.float32) * 0.1).astype(jnp.bfloat16)
        pet = jnp.float32
    np.asarray(_mm_loop(a, b, 1, pet))          # compile+warm (1-rep variant)
    np.asarray(_mm_loop(a, b, reps + 1, pet))   # compile reps variant
    t0 = time.time()
    np.asarray(_mm_loop(a, b, reps + 1, pet))
    t_full = time.time() - t0
    t0 = time.time()
    np.asarray(_mm_loop(a, b, 1, pet))
    t_one = time.time() - t0                    # dispatch+sync+1 iter
    sec = max((t_full - t_one) / reps, 1e-9)    # marginal per-iteration cost
    return sec, 2 * m * k * n / sec / 1e12


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    shapes = [
        ("qkv    ", 14336, 1536, 2048),
        ("o_proj ", 14336, 1536, 1536),
        ("gate_up", 14336, 1536, 17920),
        ("down   ", 14336, 8960, 1536),
        ("probe_r2", 6144, 1536, 8960),   # the round-2 ceiling probe shape
        ("bigK   ", 14336, 8960, 8960),   # MXU-friendliest reference point
        ("M4096  ", 4096, 1536, 17920),
    ]
    for name, m, k, n in shapes:
        row = [name, f"{m}x{k}x{n}"]
        for dt in ("bf16", "int8"):
            sec, tops = bench_matmul(m, k, n, dt)
            row.append(f"{dt}={tops:7.1f} T/s ({sec*1e3:6.2f} ms)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
