#!/usr/bin/env bash
# Full on-chip measurement matrix for a round: refreshes every BENCH_DETAILS
# entry on the current build and A/Bs the host-path pipeline knobs in one
# session (tunnel drift makes cross-session A/B meaningless — see
# PERFORMANCE.md "Run-to-run variance").
#
# Usage:  bash scripts/bench_matrix.sh [outdir]        (defaults ./bench_matrix_out)
# Needs the TPU backend up (bench.py probes and waits via BENCH_DEVICE_WAIT).
# Expect ~30-60 min total; the persistent XLA cache (/tmp/jax_cache) makes
# repeat configs cheap.
set -u
OUT="${1:-bench_matrix_out}"
mkdir -p "$OUT"
log() { echo "[matrix $(date +%H:%M:%S)] $*" | tee -a "$OUT/matrix.log"; }

run_bench() {  # name, env pairs...
  local name="$1"; shift
  log "bench $name: $*"
  if env "$@" timeout 3600 python bench.py > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    log "  -> $(cat "$OUT/$name.json")"
  else
    log "  -> FAILED (see $OUT/$name.err)"
  fi
}

# 1. headline + batch scaling (driver protocol config first so its
#    BENCH_DETAILS entry reflects the final build)
run_bench short_facts_b32  BENCH_CONFIG=short_facts BENCH_BATCH=32
run_bench short_facts_b64  BENCH_CONFIG=short_facts BENCH_BATCH=64
run_bench short_facts_b128 BENCH_CONFIG=short_facts BENCH_BATCH=128

# 2. host-path pipeline A/B on ONE warmed engine (FINALIZE_ASYNC,
#    PREFETCH_WORKERS, STAGE_PROMPTS) — wall req/s per config + device proxy
log "ab_processor short_facts"
timeout 3600 python scripts/ab_processor.py > "$OUT/ab_short_facts.json" 2> "$OUT/ab_short_facts.err" \
  && log "  -> $(cat "$OUT/ab_short_facts.json")"

# 3. the cache-off bounds (honest no-cache rows; metric names gain suffixes)
run_bench short_facts_noqcache BENCH_CONFIG=short_facts BENCH_BATCH=32 QUERY_CACHE_SIZE=0
run_bench squad_real           BENCH_CONFIG=squad_real  BENCH_BATCH=32
run_bench squad_real_noqcache  BENCH_CONFIG=squad_real  BENCH_BATCH=32 QUERY_CACHE_SIZE=0
run_bench squad_real_noprefix  BENCH_CONFIG=squad_real  BENCH_BATCH=32 PREFIX_CACHE=0
run_bench squad_synthetic      BENCH_CONFIG=squad_synthetic BENCH_BATCH=32

# 4. suffix-bucket experiment (adds compiled programs; warm cache covers
#    repeats) — compare device proxy vs the short_facts_b32 row
run_bench short_facts_suffix24 BENCH_CONFIG=short_facts BENCH_BATCH=32 SUFFIX_LEN_BUCKETS=24,32,64

log "done; BENCH_DETAILS.json refreshed in-place, per-run stdout in $OUT/"
