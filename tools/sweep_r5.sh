#!/bin/bash
# Round-5 first wave: the two levers VERDICT r4 ranked 1-2, interleaved
# vs the adopted default (pairs-1620, hwnc/down2/hwncs1d/dirpack):
#   * hwncp — lane-packed layer1 stage (fori_loop band rewrite fixed
#     the scoped-VMEM stack OOM; min_hwncp_r5b.log all-green first)
#   * pallas5 — all-5-channel fused prep (kills the ~2 GB/step einsum
#     mask-path HBM traffic)
#   * combos, then the same ladder at directions=1 (where prep is ~22%
#     of the step and both levers matter ~2x more)
# Gates (tpu_gate v2-hwncp + v2-hwncp-dirpack, prep_gate --fuse-masks)
# run FIRST from the session before this sweep; this script only
# benches.
# Usage: nohup bash tools/sweep_r5.sh >> tools/artifacts/ab_r5.log 2>&1 &
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

run default-a
run hwncp-a --pallas-features $HWNCP
run pallas5-a --prep-rgb pallas5
run default-b
run hwncp-b --pallas-features $HWNCP
run pallas5-b --prep-rgb pallas5
run combo-a --pallas-features $HWNCP --prep-rgb pallas5
run default-c
run combo-b --pallas-features $HWNCP --prep-rgb pallas5

run d1-default-a --profile serving-d1
run d1-hwncp-a --profile serving-d1 --pallas-features $HWNCP
run d1-pallas5-a --profile serving-d1 --prep-rgb pallas5
run d1-default-b --profile serving-d1
run d1-combo-a --profile serving-d1 --pallas-features $HWNCP --prep-rgb pallas5
run d1-hwncp-b --profile serving-d1 --pallas-features $HWNCP
run d1-combo-b --profile serving-d1 --pallas-features $HWNCP --prep-rgb pallas5

echo "=== sweep r5 done $(date -u +%H:%M:%S)"
