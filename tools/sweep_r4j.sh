#!/bin/bash
# Round-4 tenth wave: prep matmul precision (HIGH = 3-pass bf16 vs
# 1-pass DEFAULT — the RGB resize einsums measured at their
# precision-implied peak, so 1-pass should return ~2/3 of stage-1/2
# time; a pure serving knob, pixel rounds can deviate 1 LSB) and a
# directions=1 serving-mode refresh at the current kernel state (last
# measured 7,056 at the round-2 state).
# Waits for the r4i marker so runs never overlap on the one chip.
# Usage: nohup bash tools/sweep_r4j.sh >> tools/artifacts/ab_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r4

for _ in $(seq 1 240); do
  grep -q 'sweep r4i done' tools/artifacts/ab_r4.log && break
  sleep 30
done

run() {
  local label="$1"; shift
  local errf="tools/artifacts/stderr_r4/${label}.err"
  echo "=== $label : $* $(date -u +%H:%M:%S)"
  timeout 1500 python bench.py "$@" 2> "$errf"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== $label FAILED (rc=$rc)"
    tail -30 "$errf"
  else
    grep -v 'Platform .axon. is experimental' "$errf" | tail -2
  fi
}

run prep-prec-a --prep-precision default
run default-i
run prep-prec-b --prep-precision default
run dir1-a --directions 1
run dir1-b --directions 1 --pairs-per-step 2160

echo "=== sweep r4j done $(date -u +%H:%M:%S)"
