#!/usr/bin/env bash
# Resume the single-pattern uniform reference-protocol ladder after an
# interruption (run_refprotocol.sh would restart at rung 1 and clobber the
# CSV header). Appends rows to the existing sweep_uniform.csv, continuing
# the exact seed sequence of benchmarks/load_test.sh (seed = 11 + rps/5).
set -u
cd "$(dirname "$0")/.."

ENDPOINT="${ENDPOINT:-http://localhost:8010}"
OUT_DIR="benchmarks/results_refprotocol"
CSV="$OUT_DIR/sweep_uniform.csv"
FROM_RPS="${FROM_RPS:-95}"
TO_RPS="${TO_RPS:-390}"
DURATION=60
P99_GATE=10

for RPS in $(seq "$FROM_RPS" 5 "$TO_RPS"); do
  SEED=$((11 + RPS / 5))
  OUT_JSON="$OUT_DIR/uniform_rps${RPS}.json"
  echo "=== pattern=uniform rps=$RPS seed=$SEED duration=${DURATION}s ==="
  python benchmarks/load_generator.py \
    --endpoint "$ENDPOINT" --pattern uniform --rps "$RPS" \
    --duration "$DURATION" --seed "$SEED" --timeout 60 \
    --query-sample random --queries-file data/squad_real_queries.json \
    --output "$OUT_JSON" || { echo "run failed"; exit 1; }
  ROW=$(python - "$OUT_JSON" "$RPS" <<'PYEOF'
import json, sys
m = json.load(open(sys.argv[1])); lat = m.get("latency", {})
print(",".join(str(x) for x in [
    "uniform", sys.argv[2], f"{m['duration_seconds']:.1f}", m["total_requests"],
    m["successful_requests"], m["failed_requests"],
    f"{m['throughput_rps']:.2f}", f"{m['successful_throughput_rps']:.2f}",
    f"{lat.get('p50', -1):.3f}", f"{lat.get('p95', -1):.3f}",
    f"{lat.get('p99', -1):.3f}"]))
PYEOF
)
  echo "$ROW" >> "$CSV"
  P99=${ROW##*,}
  echo "p99=${P99}s"
  if python -c "import sys; sys.exit(0 if float('$P99') >= $P99_GATE else 1)"; then
    echo "p99 >= ${P99_GATE}s — stopping uniform ladder"
    break
  fi
done
echo "resume done (last rung: $RPS)"
