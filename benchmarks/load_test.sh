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

declare -A MAX_SUSTAINED
rps_ladder() { # emits 1 5 10 15 ... MAX_RPS
  echo 1
  local r=5
  while [ "$r" -le "$MAX_RPS" ]; do echo "$r"; r=$((r + 5)); done
}

for PATTERN in uniform random; do
  SEED_BASE=$SEED_BASE_UNIFORM
  [ "$PATTERN" = "random" ] && SEED_BASE=$SEED_BASE_RANDOM
  MAX_SUSTAINED[$PATTERN]=0
  i=0
  for RPS in $(rps_ladder); do
    i=$((i + 1))
    SEED=$((SEED_BASE + i))
    OUT_JSON="$OUT_DIR/${PATTERN}_rps${RPS}.json"
    echo "=== pattern=$PATTERN rps=$RPS seed=$SEED duration=${DURATION}s ==="
    python benchmarks/load_generator.py \
      --endpoint "$ENDPOINT" --pattern "$PATTERN" --rps "$RPS" \
      --duration "$DURATION" --seed "$SEED" --timeout "$TIMEOUT" \
      --output "$OUT_JSON" || { echo "run failed"; break; }
    ROW=$(extract_metrics "$OUT_JSON" "$PATTERN" "$RPS" 2> /tmp/p99.txt)
    echo "$ROW" >> "$CSV"
    P99=$(sed 's/P99=//' /tmp/p99.txt)
    echo "p99=${P99}s"
    GATE_HIT=$(python -c "print(1 if float('$P99') >= float('$P99_GATE') else 0)")
    if [ "$GATE_HIT" = "1" ]; then
      echo "p99 >= ${P99_GATE}s — stopping $PATTERN ladder"
      break
    fi
    MAX_SUSTAINED[$PATTERN]=$RPS
  done
done

echo
echo "================ SWEEP SUMMARY ================"
for PATTERN in uniform random; do
  echo "max sustainable rps ($PATTERN): ${MAX_SUSTAINED[$PATTERN]}"
done
echo "csv: $CSV"
