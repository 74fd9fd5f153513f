#!/bin/bash
# Round-4 twelfth wave: the two data-movement levers, interleaved vs
# the adopted default (pairs-1620, hwnc/down2/hwncs1d):
#   * dirpack — siamese direction axis -> interleaved trunk batch via
#     bitcasts (kills the 3.5 ms channel-split/concat fusions)
#   * prep-rgb pallas — fused crop+resize kernel (VMEM-resident
#     intermediate, windowed K; attacks the 13.3 ms prep slice)
#   * combo — both together (independent stages; expected additive)
# Gates (tpu_gate v2-dirpack, prep_gate) run FIRST from the session
# before this sweep is launched; this script only benches.
# Usage: nohup bash tools/sweep_r4l.sh >> tools/artifacts/ab_r4.log 2>&1 &
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

run dirpack-a --pallas-features hwnc,down2,hwncs1d,dirpack
run preppallas-a --prep-rgb pallas
run default-l
run dirpack-b --pallas-features hwnc,down2,hwncs1d,dirpack
run preppallas-b --prep-rgb pallas
run combo-dp-a --pallas-features hwnc,down2,hwncs1d,dirpack --prep-rgb pallas
run default-m
run combo-dp-b --pallas-features hwnc,down2,hwncs1d,dirpack --prep-rgb pallas

# directions=1 at the CURRENT kernel state: the PERFORMANCE.md d1
# table is round-2 (pre-v2; int8 d1 = 5,824 'still VPU-bound'). The
# ceiling math names d1 as one of the two routes to 10k — measure it.
run d1-a --directions 1
run d1-prep-a --directions 1 --prep-rgb pallas
run d1-b --directions 1

echo "=== sweep r4l done $(date -u +%H:%M:%S)"
