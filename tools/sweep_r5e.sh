#!/bin/bash
# Round-5 wave 4: the d1 10k push beyond pallas5.
#   1) d1 --pairs-per-step 3240: at d1 the trunk batch is P (not 2P as
#      at d2+dirpack), so the r4 "saturation exhausted at 1620" result
#      (measured at d2, trunk 3240) does NOT cover d1 — doubling the
#      pair count restores the exact trunk batch the d2 default runs.
#   2) d1 --prep-precision default: pallas5's 1-pass bf16 RGB mode (a
#      documented serving knob; masks stay bit-exact) — prep is ~2x the
#      relative cost at d1.
#   3) their combination.
# Usage: nohup bash tools/sweep_r5e.sh >> tools/artifacts/ab_r5e.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r5

run() {
  local tmo="$1" label="$2"; shift 2
  local errf="tools/artifacts/stderr_r5/${label}.err"
  echo "=== $label : $* $(date -u +%H:%M:%S)"
  timeout "$tmo" python bench.py "$@" 2> "$errf"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== $label FAILED (rc=$rc)"
    tail -30 "$errf"
  else
    grep -v 'Platform .axon. is experimental' "$errf" | tail -2
  fi
}

P5="--prep-rgb pallas5"
D1="--profile serving-d1"

# cold compiles first (new shapes / new prep program)
run 5400 warm-d1-p5-3240 $D1 $P5 --pairs-per-step 3240
run 3600 warm-d1-p5-pp1 $D1 $P5 --prep-precision default

# interleaved decision runs vs the d1+pallas5 base
run 2700 d1-p5-3240-a $D1 $P5 --pairs-per-step 3240
run 2700 d1-p5-base-a $D1 $P5
run 2700 d1-p5-pp1-a $D1 $P5 --prep-precision default
run 2700 d1-p5-3240-b $D1 $P5 --pairs-per-step 3240
run 2700 d1-p5-base-b $D1 $P5
run 5400 d1-p5-3240-pp1-a $D1 $P5 --pairs-per-step 3240 --prep-precision default
run 2700 d1-p5-pp1-b $D1 $P5 --prep-precision default
run 2700 d1-p5-3240-pp1-b $D1 $P5 --pairs-per-step 3240 --prep-precision default

echo "=== sweep r5e done $(date -u +%H:%M:%S)"
