#!/usr/bin/env bash
# Poisson-arrival budget-variance A/B over the REAL HTTP server: fixed-scan
# decode (+ budget-aware regroup) vs the continuous decode pool, when
# requests stream in asynchronously (pattern=poisson) and each carries its
# own max_new_tokens ~ uniform [8, 64].
#
# This is the regime the windowed bench (scripts/bench_budget_ab.sh) cannot
# produce: there the serving loop issues synchronized 32-request windows, so
# the fixed path's (gen_budget, suffix_len) regroup captures the variance
# near-optimally (173.5 vs continuous 150.9 req/s on chip). Under Poisson
# arrivals the batching window holds whatever the arrival process delivered
# — regrouping can only sort WITHIN that window, while the pool admits each
# request as slots free and retires it at its own budget. The open question
# this run answers: at what offered rate does each design saturate, and what
# latency does each hold below saturation.
#
# Output: benchmarks/results_budget_poisson/{fixed,continuous}/rps<N>.json
# (collector schema) + summary.json with the side-by-side table.
#
# Usage: bash scripts/server_budget_poisson_ab.sh [rps list...]
set -u
cd "$(dirname "$0")/.."

PORT="${PORT:-8011}"
OUT_DIR="${OUT_DIR:-benchmarks/results_budget_poisson}"
DURATION="${DURATION:-60}"
SPREAD="${SPREAD:-8,64}"
RUNGS=("${@:-}")
if [ -z "${RUNGS[0]:-}" ]; then RUNGS=(40 80 120 160); fi
mkdir -p "$OUT_DIR/fixed" "$OUT_DIR/continuous"

start_server() { # $1 = mode
  local mode="$1" extra=()
  if [ "$mode" = continuous ]; then
    extra=(DECODE_MODE=continuous DECODE_WINDOW=704 DECODE_SLOTS=64 DECODE_CHUNK=8)
  else
    extra=(DECODE_MODE=fixed)
  fi
  echo "[poisson-ab] starting $mode server on :$PORT (EOS_BIAS=${EOS_BIAS:-0})"
  env EOS_BIAS="${EOS_BIAS:-0}" DOCUMENT_TEXT_FILE=data/squad_real_contexts.json \
    DOCUMENT_EMBEDDINGS_FILE=data/squad_real_embeddings.npy \
    DOCUMENT_QUERIES_FILE=data/squad_real_queries.json \
    MAX_BATCH_SIZE=32 BATCH_BUCKETS=8,32 MAX_NEW_TOKENS=64 \
    QUANT_WEIGHTS=int8 QUANT_ACT=int8 \
    PREFIX_CACHE_MB=4000 PREFIX_CACHE_DTYPE=int8 PREFIX_POOL_LEN=512 \
    PROMPT_LEN_BUCKETS=192,256,384,448,512,640,1024 ENCODE_LEN_BUCKETS=32,64 \
    WARMUP_FULL=1 WARMUP_OVERFLOW_CAP=1024 PORT=$PORT "${extra[@]}" \
    python main.py > "$OUT_DIR/$mode/server.log" 2>&1 &
  SERVER_PID=$!
  echo $SERVER_PID > /tmp/poisson_ab_server.pid
  for i in $(seq 1 240); do
    curl -sf "http://localhost:$PORT/health" > /dev/null 2>&1 && return 0
    kill -0 $SERVER_PID 2>/dev/null || { echo "[poisson-ab] $mode server died:"; tail -5 "$OUT_DIR/$mode/server.log"; return 1; }
    sleep 5
  done
  echo "[poisson-ab] $mode server never became healthy"; return 1
}

stop_server() {
  kill "$SERVER_PID" 2>/dev/null
  wait "$SERVER_PID" 2>/dev/null
}

MODES="${MODES:-fixed continuous}"
for mode in $MODES; do
  # Resumable: skip rungs that already have results for this mode.
  todo=()
  for rps in "${RUNGS[@]}"; do
    [ -s "$OUT_DIR/$mode/rps${rps}.json" ] || todo+=("$rps")
  done
  if [ ${#todo[@]} -eq 0 ]; then echo "[poisson-ab] $mode: all rungs done, skipping"; continue; fi
  start_server "$mode" || exit 1
  for rps in "${todo[@]}"; do
    echo "[poisson-ab] $mode @ ${rps} rps x ${DURATION}s (budgets $SPREAD)"
    BUDGET_ARGS=()
    [ -n "$SPREAD" ] && BUDGET_ARGS=(--budget-spread "$SPREAD")
    python benchmarks/load_generator.py \
      --endpoint "http://localhost:$PORT" --pattern poisson --rps "$rps" \
      --duration "$DURATION" --seed 42 --timeout 30 \
      --queries-file data/squad_real_queries.json --query-sample random \
      "${BUDGET_ARGS[@]}" \
      --output "$OUT_DIR/$mode/rps${rps}.json" | tail -3
  done
  curl -s "http://localhost:$PORT/stats" > "$OUT_DIR/$mode/stats_final.json" || true
  stop_server
done

python - "$OUT_DIR" <<'EOF'
import json, os, sys
out = sys.argv[1]
rows = {}
for mode in ("fixed", "continuous"):
    d = os.path.join(out, mode)
    for f in sorted(os.listdir(d)):
        if not f.startswith("rps") or not f.endswith(".json"):
            continue
        m = json.load(open(os.path.join(d, f)))
        rps = int(f[3:-5])
        lat = m.get("latency", {})
        rows.setdefault(rps, {})[mode] = {
            "ok_rps": round(m["successful_throughput_rps"], 2),
            "fail": m["failed_requests"],
            "p50_s": round(lat.get("p50", float("nan")), 3),
            "p99_s": round(lat.get("p99", float("nan")), 3),
        }
summary = {"workload": os.environ.get(
               "AB_WORKLOAD", "poisson arrivals, max_new_tokens ~ U[8,64] seed 42"),
           "rungs": rows}
with open(os.path.join(out, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1))
EOF
echo "[poisson-ab] done: $OUT_DIR/summary.json"
