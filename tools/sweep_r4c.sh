#!/bin/bash
# Round-4 third wave, chained after tools/sweep_r4b.sh:
#   1. pairs-1620 retry (r4 run died with an opaque FAILED_PRECONDITION
#      backend error during calibration while 540/1080/2160 all ran —
#      suspected transient tunnel fault; retry with full tracebacks).
#   2. Fresh xplane trace at the NEW default (hwnc,down1,down2 int8 v2,
#      5,020 pairs/s) — the last stage rollup predates the down kernels.
#   3. int8c-hwnc Mosaic minimizer (VERDICT item 5): per-kernel isolation
#      compile on real hardware to localise the HTTP 500 trigger.
# Usage: nohup bash tools/sweep_r4c.sh >> tools/artifacts/ab_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r4

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

JAX_TRACEBACK_FILTERING=off run pairs-1620-retry --pairs-per-step 1620

echo "=== trace: default (int8 v2, hwnc,down1,down2) $(date -u +%H:%M:%S)"
timeout 1800 python tools/trace_report.py --dtype int8 --pairs 540 \
  --out /tmp/trace_r4_default \
  > tools/artifacts/trace_r4_default.txt \
  2> tools/artifacts/stderr_r4/trace-default.err \
  || { echo "=== trace FAILED"; tail -10 tools/artifacts/stderr_r4/trace-default.err; }
tail -40 tools/artifacts/trace_r4_default.txt

echo "=== int8c mosaic minimizer $(date -u +%H:%M:%S)"
timeout 3000 python tools/min_int8c_mosaic.py \
  > tools/artifacts/min_int8c_r4.txt \
  2> tools/artifacts/stderr_r4/min-int8c.err \
  || { echo "=== minimizer FAILED (rc=$?)"; \
       tail -10 tools/artifacts/stderr_r4/min-int8c.err; }
cat tools/artifacts/min_int8c_r4.txt

echo "=== sweep r4c done $(date -u +%H:%M:%S)"
