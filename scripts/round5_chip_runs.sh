#!/usr/bin/env bash
# Round-5 on-chip measurement sequence. Self-waiting: blocks until the axon
# backend answers a real matmul probe, then runs, in order:
#   1. speculative-decode A/B at the mnt64 shape (profile_spec_decode.py)
#   2. EOS_BIAS -> completion-length calibration (calibrate_eos_bias.py)
#   3. bench.py mnt64 ledger rows: greedy base + greedy spec
# Logs under /tmp/round5_runs/. Designed to run under nohup during a
# backend outage and simply start when the chip returns.
set -u
cd "$(dirname "$0")/.."
LOGS=/tmp/round5_runs
mkdir -p "$LOGS"

echo "[round5] waiting for backend..."
for i in $(seq 1 720); do   # up to ~12 h, probing every minute
  if timeout 120 python -c \
    "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)))" \
    > /dev/null 2>&1; then
    echo "[round5] backend OK at $(date +%H:%M:%S)"
    break
  fi
  sleep 60
done

echo "[round5] 1/3 spec-decode A/B"
BATCH=32 PROMPT=512 MNT=64 GAMMAS=4,8 REPS=4 QUANT=int8 \
  timeout 7200 python scripts/profile_spec_decode.py \
  > "$LOGS/spec_profile.log" 2>&1
grep -v WARNING "$LOGS/spec_profile.log" | tail -6

echo "[round5] 2/3 EOS_BIAS calibration"
BATCH=32 PROMPT=512 MNT=64 BIASES=2,4,6,8,10 \
  timeout 3600 python scripts/calibrate_eos_bias.py \
  > "$LOGS/eos_calibration.log" 2>&1
grep -v WARNING "$LOGS/eos_calibration.log" | tail -6

echo "[round5] 3/3 bench mnt64 rows (greedy base, then spec)"
BENCH_CONFIG=squad_real BENCH_MNT=64 DO_SAMPLE=0 \
  timeout 7200 python bench.py > "$LOGS/bench_mnt64_greedy.log" 2>&1
tail -1 "$LOGS/bench_mnt64_greedy.log"
BENCH_CONFIG=squad_real BENCH_MNT=64 DO_SAMPLE=0 SPEC_DECODE=4 \
  timeout 7200 python bench.py > "$LOGS/bench_mnt64_spec4.log" 2>&1
tail -1 "$LOGS/bench_mnt64_spec4.log"

echo "[round5] chip runs complete at $(date +%H:%M:%S)"
