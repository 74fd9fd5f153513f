#!/bin/bash
# Round-4 fourth wave: int8c-hwnc unblocked (gate bit-exact on hardware,
# tools/artifacts/gate_int8c_r4d.log) but measured 4,105 pairs/s vs the
# v2 default's 5,063 — before descoping the full-int8 route, measure its
# knob surface (pipeline band order, conv2 strategy, stem on/off) in one
# session, bracketed by defaults; plus the pairs-1620 adoption repeats
# (5,097 single run in r4b/c vs default 5,063).
# Usage: nohup bash tools/sweep_r4d.sh >> tools/artifacts/ab_r4.log 2>&1 &
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

I8C="--dtype int8c --pallas-features"

run default-e
run pairs-1620-a --pairs-per-step 1620
run int8c-hwnc-pipe $I8C hwnc,down,stem --hwnc-pipeline
run int8c-hwnc-scatter $I8C hwnc,down,stem --hwnc-conv2 scatter
run int8c-hwnc-acc $I8C hwnc,down,stem --hwnc-conv2 acc
run int8c-hwnc-nostem $I8C hwnc,down
run pairs-1620-b --pairs-per-step 1620
run default-f

echo "=== sweep r4d done $(date -u +%H:%M:%S)"
