#!/bin/bash
# Round-5 second wave: tune the loop-structured hwncp back toward the
# unrolled kernel's overlap. First sample (ab_r5.log hwncp-a) measured
# 5,385 vs the 5,530 hwncs1d default: the fori_loop compiles everywhere
# (min_hwncp_r5b.log) but serializes bands, and the 6MB heuristic picks
# rb=2/bands=32 at serving shapes. Ladder: partial unroll (u2/u4) x
# band budget (bb12 -> bands=16, bb24 -> bands=8), interleaved with the
# default. Unroll variants are bit-identical math (interpret-verified);
# the adopted config re-gates on hardware before adoption.
# Usage: nohup bash tools/sweep_r5b.sh >> tools/artifacts/ab_r5b.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r5

run() {
  local label="$1"; shift
  local errf="tools/artifacts/stderr_r5/${label}.err"
  echo "=== $label : $* $(date -u +%H:%M:%S)"
  timeout 1800 python bench.py "$@" 2> "$errf"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== $label FAILED (rc=$rc)"
    tail -30 "$errf"
  else
    grep -v 'Platform .axon. is experimental' "$errf" | tail -2
  fi
}

HWNCP="hwnc,down2,hwncp,dirpack"

run default-d
run hwncp-u4-a --pallas-features $HWNCP --stage-unroll 4
run hwncp-u2-a --pallas-features $HWNCP --stage-unroll 2
run hwncp-bb12-u4-a --pallas-features $HWNCP --band-budget-mb 12 --stage-unroll 4
run default-e
run hwncp-u4-b --pallas-features $HWNCP --stage-unroll 4
run hwncp-bb24-u2-a --pallas-features $HWNCP --band-budget-mb 24 --stage-unroll 2
run hwncp-bb12-u4-b --pallas-features $HWNCP --band-budget-mb 12 --stage-unroll 4

echo "=== sweep r5b done $(date -u +%H:%M:%S)"
