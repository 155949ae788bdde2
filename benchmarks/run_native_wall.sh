#!/usr/bin/env bash
# Fine-grained (STEP=5, 60 s/rung — the reference ladder's granularity)
# near-wall run on the STRONGEST committed server config: native C++ HTTP
# front + MAX_BATCH_SIZE=128, short_facts protocol corpus, native C++ load
# generator. The coarse ladder (benchmarks/results_front/, STEP=160) pinned
# the wall between 1600 offered (passes, ~1254 served) and 1760 (p99 12s):
# this run walks FROM..TO at +5 to locate max sustainable to rung
# granularity, uniform + random interleaved per rung, p99>=10 s gate,
# appending rows so a cut run still leaves consistent artifacts.
set -u
cd "$(dirname "$0")/.."

PORT="${PORT:-8031}"           # aiohttp (stats/metrics)
FPORT="${FPORT:-8030}"         # native epoll front (the driven surface)
FROM="${FROM:-1550}"
TO="${TO:-1900}"
DURATION="${DURATION:-60}"
OUT_DIR="benchmarks/results_native_wall"
CSV="$OUT_DIR/sweep.csv"
mkdir -p "$OUT_DIR"

if [ ! -x benchmarks/loadgen_native ] || \
   [ benchmarks/loadgen_native.cc -nt benchmarks/loadgen_native ]; then
  g++ -O2 -std=c++17 -o benchmarks/loadgen_native benchmarks/loadgen_native.cc
fi

# REUSE=1 drives an already-running warmed server on FPORT (e.g. after a
# prior invocation's health-wait expired but the server finished warming)
if [ "${REUSE:-0}" = "1" ] && curl -sf "http://localhost:$FPORT/health" > /dev/null 2>&1; then
  echo "[native-wall] reusing live server on :$FPORT"
  SERVER_PID=""
else
echo "[native-wall] starting b128 + native-front server"
MAX_BATCH_SIZE=128 BATCH_BUCKETS=32,128 \
QUANT_WEIGHTS=int8 QUANT_ACT=int8 \
PREFIX_CACHE_MB=2048 PROMPT_LEN_BUCKETS=64,96,128 ENCODE_LEN_BUCKETS=32,64 \
WARMUP_FULL=1 PREFETCH_WORKERS=2 \
NATIVE_FRONT_PORT=$FPORT PORT=$PORT \
timeout "${SERVER_TIMEOUT:-10800}" python main.py \
  > "$OUT_DIR/server.log" 2>&1 &
SERVER_PID=$!
echo $SERVER_PID > /tmp/native_wall_server.pid

# b128 WARMUP_FULL warms a (batch x seq) matrix that can take ~30 min on a
# cold XLA cache — wait up to 45 min, and reap the server if we give up
for i in $(seq 1 540); do
  curl -sf "http://localhost:$FPORT/health" > /dev/null 2>&1 && break
  kill -0 $SERVER_PID 2>/dev/null || { echo "[native-wall] server died:"; tail -5 "$OUT_DIR/server.log"; exit 1; }
  sleep 5
done
curl -sf "http://localhost:$FPORT/health" > /dev/null || {
  echo "[native-wall] never healthy"; kill "$SERVER_PID" 2>/dev/null; exit 1; }
fi
echo "[native-wall] healthy; ladder $FROM..$TO step 5"

[ -f "$CSV" ] || echo "pattern,rps,duration,total,success,fail,throughput,success_throughput,p50,p95,p99" > "$CSV"

declare -A STOPPED MAXOK
STOPPED[uniform]=0; STOPPED[random]=0
MAXOK[uniform]=0; MAXOK[random]=0
for RPS in $(seq "$FROM" 5 "$TO"); do
  for PATTERN in uniform random; do
    [ "${STOPPED[$PATTERN]}" = "1" ] && continue
    BASE=10; [ "$PATTERN" = "random" ] && BASE=210
    SEED=$((BASE + RPS / 5 + 1))    # load_test.sh's seed convention
    OUT_JSON="$OUT_DIR/${PATTERN}_rps${RPS}.json"
    echo "=== pattern=$PATTERN rps=$RPS seed=$SEED ==="
    benchmarks/loadgen_native \
      --endpoint "http://localhost:$FPORT" --pattern "$PATTERN" \
      --rps "$RPS" --duration "$DURATION" --seed "$SEED" --timeout 60 \
      --output "$OUT_JSON" || { echo "run failed"; STOPPED[$PATTERN]=1; continue; }
    ROW=$(python - "$OUT_JSON" "$PATTERN" "$RPS" <<'PYEOF'
import json, sys
m = json.load(open(sys.argv[1])); lat = m.get("latency", {})
print(",".join(str(x) for x in [
    sys.argv[2], sys.argv[3], f"{m['duration_seconds']:.1f}",
    m["total_requests"], m["successful_requests"], m["failed_requests"],
    f"{m['throughput_rps']:.2f}", f"{m['successful_throughput_rps']:.2f}",
    f"{lat.get('p50', -1):.3f}", f"{lat.get('p95', -1):.3f}",
    f"{lat.get('p99', -1):.3f}"]))
PYEOF
)
    echo "$ROW" >> "$CSV"
    P99=${ROW##*,}
    echo "p99=${P99}s"
    if python -c "import sys; sys.exit(0 if 0 <= float('$P99') < 10 else 1)"; then
      MAXOK[$PATTERN]=$RPS
    else
      echo "gate fired — stopping $PATTERN"
      STOPPED[$PATTERN]=1
    fi
  done
  [ "${STOPPED[uniform]}" = "1" ] && [ "${STOPPED[random]}" = "1" ] && break
done

if [ -n "$SERVER_PID" ]; then
  kill "$SERVER_PID" 2>/dev/null
  wait "$SERVER_PID" 2>/dev/null
fi

python - "$OUT_DIR" "${MAXOK[uniform]}" "${MAXOK[random]}" <<'PYEOF'
import csv, json, sys
out, mu, mr = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
rows = list(csv.DictReader(open(f"{out}/sweep.csv")))
summary = {
    "purpose": "fine-grained (STEP=5, 60 s/rung) near-wall ladder on the "
               "strongest server config: native C++ HTTP front + batch 128 "
               "(coarse ladder benchmarks/results_front/ pinned the wall "
               "between 1600 and 1760 offered at STEP=160)",
    "server": "short_facts protocol corpus, int8+W8A8, MAX_BATCH_SIZE=128 "
              "BATCH_BUCKETS=32,128, native front (native/httpfront.cc), "
              "native C++ loadgen, machine otherwise idle",
    "protocol": "reference byte-level granularity near the wall: rungs "
                "FROM..(+5), 60 s/rung, uniform+random interleaved, "
                "p99>=10 s gate per pattern (coarse region 1..1550 is the "
                "committed results_front ladder)",
    "max_sustainable_rps": {"uniform": mu, "random": mr},
    "rungs": len(rows),
    "failed_requests_total": sum(int(r["fail"]) for r in rows),
}
with open(f"{out}/summary.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1))
PYEOF
