#!/usr/bin/env bash
# RPS-ladder load sweep (reference: benchmarks/load_test.sh).
# Ladder 1 -> 5 -> +5 ... up to MAX_RPS, DURATION seconds per run, both
# `uniform` and `random` patterns; a pattern stops once p99 latency >= P99_GATE
# seconds; per-run JSON is folded into one CSV and a max-sustainable-RPS
# summary is printed per pattern.
set -u

ENDPOINT="${ENDPOINT:-http://localhost:8000}"
DURATION="${DURATION:-60}"
MAX_RPS="${MAX_RPS:-1000}"
P99_GATE="${P99_GATE:-10}"
TIMEOUT="${TIMEOUT:-60}"
SEED_BASE_UNIFORM="${SEED_BASE_UNIFORM:-10}"
SEED_BASE_RANDOM="${SEED_BASE_RANDOM:-210}"
OUT_DIR="${OUT_DIR:-benchmarks/results}"
CSV="${CSV:-$OUT_DIR/sweep.csv}"

mkdir -p "$OUT_DIR"
echo "pattern,rps,duration,total,success,fail,throughput,success_throughput,p50,p95,p99" > "$CSV"

extract_metrics() {  # $1 = json file, $2 = pattern, $3 = rps
  python - "$1" "$2" "$3" <<'PYEOF'
import json, sys
path, pattern, rps = sys.argv[1], sys.argv[2], sys.argv[3]
m = json.load(open(path))
lat = m.get("latency", {})
row = [pattern, rps, f"{m['duration_seconds']:.1f}", m["total_requests"],
       m["successful_requests"], m["failed_requests"],
       f"{m['throughput_rps']:.2f}", f"{m['successful_throughput_rps']:.2f}",
       f"{lat.get('p50', -1):.3f}", f"{lat.get('p95', -1):.3f}", f"{lat.get('p99', -1):.3f}"]
print(",".join(str(x) for x in row))
print(f"P99={lat.get('p99', -1)}", file=sys.stderr)
PYEOF
}

# STEP controls ladder granularity (reference steps +5; against a server
# that saturates 20x higher, a coarser step keeps the sweep's wall time
# sane — set STEP=5 for the byte-level reference protocol)
STEP="${STEP:-5}"
declare -A MAX_SUSTAINED STOPPED
rps_ladder() { # emits 1 STEP 2*STEP ... MAX_RPS
  echo 1
  local r=$STEP
  while [ "$r" -le "$MAX_RPS" ]; do echo "$r"; r=$((r + STEP)); done
}

MAX_SUSTAINED[uniform]=0; MAX_SUSTAINED[random]=0
STOPPED[uniform]=0; STOPPED[random]=0
# PATTERNS narrows the run (e.g. PATTERNS=uniform re-runs one pattern after
# a warmup gap without repeating the other's hours); default = reference's
# interleaved pair
PATTERNS="${PATTERNS:-uniform random}"
for P in uniform random; do
  case " $PATTERNS " in *" $P "*) ;; *) STOPPED[$P]=1 ;; esac
done
i=0
# patterns run INTERLEAVED per RPS rung (reference load_test.sh:164-168):
# uniform then random at each step, so both see the same thermal/cache state
for RPS in $(rps_ladder); do
  i=$((i + 1))
  for PATTERN in uniform random; do
    [ "${STOPPED[$PATTERN]}" = "1" ] && continue
    SEED_BASE=$SEED_BASE_UNIFORM
    [ "$PATTERN" = "random" ] && SEED_BASE=$SEED_BASE_RANDOM
    SEED=$((SEED_BASE + i))
    OUT_JSON="$OUT_DIR/${PATTERN}_rps${RPS}.json"
    echo "=== pattern=$PATTERN rps=$RPS seed=$SEED duration=${DURATION}s ==="
    # LOADGEN=native uses the C++ epoll client (benchmarks/loadgen_native.cc;
    # same flags/trace semantics/output schema). On the single-core
    # measurement host the asyncio client costs a large fraction of the CPU
    # at high RPS — the native client saturates a null server at ~1940 rps
    # vs ~720 for the asyncio one, so rungs past ~500 measure the SERVER
    # only with LOADGEN=native.
    if [ "${LOADGEN:-python}" = "native" ]; then
      # rebuild when missing OR stale relative to the source
      if [ ! -x benchmarks/loadgen_native ] || \
         [ benchmarks/loadgen_native.cc -nt benchmarks/loadgen_native ]; then
        g++ -O2 -std=c++17 -o benchmarks/loadgen_native benchmarks/loadgen_native.cc
      fi
      LOADGEN_CMD=(benchmarks/loadgen_native)
    else
      LOADGEN_CMD=(python benchmarks/load_generator.py)
    fi
    "${LOADGEN_CMD[@]}" \
      --endpoint "$ENDPOINT" --pattern "$PATTERN" --rps "$RPS" \
      --duration "$DURATION" --seed "$SEED" --timeout "$TIMEOUT" \
      --query-sample "${QUERY_SAMPLE:-cycle}" \
      ${QUERIES_FILE:+--queries-file "$QUERIES_FILE"} \
      --output "$OUT_JSON" || { echo "run failed"; STOPPED[$PATTERN]=1; continue; }
    ROW=$(extract_metrics "$OUT_JSON" "$PATTERN" "$RPS" 2> /tmp/p99.txt)
    echo "$ROW" >> "$CSV"
    P99=$(sed 's/P99=//' /tmp/p99.txt)
    echo "p99=${P99}s"
    GATE_HIT=$(python -c "print(1 if float('$P99') >= float('$P99_GATE') else 0)")
    if [ "$GATE_HIT" = "1" ]; then
      echo "p99 >= ${P99_GATE}s — stopping $PATTERN ladder"
      STOPPED[$PATTERN]=1
    else
      MAX_SUSTAINED[$PATTERN]=$RPS
    fi
  done
  [ "${STOPPED[uniform]}" = "1" ] && [ "${STOPPED[random]}" = "1" ] && break
done

echo
echo "================ SWEEP SUMMARY ================"
for PATTERN in uniform random; do
  echo "max sustainable rps ($PATTERN): ${MAX_SUSTAINED[$PATTERN]}"
done
echo "csv: $CSV"
