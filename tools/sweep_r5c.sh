#!/bin/bash
# Round-5 third wave. ab_r5.log wave-1 results:
#   d2: default 5530/5532/5530 | hwncp 5385/5391 (LOSS -2.6%)
#       pallas5 5865 (+6.1%, one clean sample; first compile >30min
#       timed out, cached after) | combo 5726/5729 (pallas5 win minus
#       the hwncp loss — deltas consistent)
#   d1: default 8839 | (rest in wave 1)
# This wave:
#   1) reproduce pallas5 at d2 (adoption needs >=2 interleaved) and d1
#   2) tune hwncp ON the pallas5 base (u4 partial unroll, band budgets
#      12/24MB) — the fori_loop serializes bands; unroll buys back ILP
#   3) d1 ladder for the 10k push
# Usage: nohup bash tools/sweep_r5c.sh >> tools/artifacts/ab_r5c.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r5

run() {
  local label="$1"; shift
  local errf="tools/artifacts/stderr_r5/${label}.err"
  echo "=== $label : $* $(date -u +%H:%M:%S)"
  timeout 2700 python bench.py "$@" 2> "$errf"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== $label FAILED (rc=$rc)"
    tail -30 "$errf"
  else
    grep -v 'Platform .axon. is experimental' "$errf" | tail -2
  fi
}

HWNCP="hwnc,down2,hwncp,dirpack"
P5="--prep-rgb pallas5"

# d2: pallas5 reproduction vs current default, interleaved
run pallas5-c $P5
run default-f
run pallas5-d $P5

# d2: hwncp tuning on the pallas5 base
run p5-hwncp-u4-a $P5 --pallas-features $HWNCP --stage-unroll 4
run pallas5-e $P5
run p5-hwncp-bb12-u4-a $P5 --pallas-features $HWNCP --band-budget-mb 12 --stage-unroll 4
run p5-hwncp-u4-b $P5 --pallas-features $HWNCP --stage-unroll 4
run p5-hwncp-bb24-u2-a $P5 --pallas-features $HWNCP --band-budget-mb 24 --stage-unroll 2

# d1: the 10k push — pallas5 repeats + best hwncp variant
run d1-pallas5-b --profile serving-d1 $P5
run d1-default-c --profile serving-d1
run d1-pallas5-c --profile serving-d1 $P5
run d1-p5-hwncp-u4-a --profile serving-d1 $P5 --pallas-features $HWNCP --stage-unroll 4
run d1-pallas5-d --profile serving-d1 $P5
run d1-p5-hwncp-u4-b --profile serving-d1 $P5 --pallas-features $HWNCP --stage-unroll 4

echo "=== sweep r5c done $(date -u +%H:%M:%S)"
