#!/bin/bash
# Round-3 second-wave A/B sweep (PERFORMANCE.md "Round 3 continued").
# Serialized bench.py runs on the real TPU; one labeled JSON line each.
# Usage: nohup bash tools/sweep_r3g.sh >> tools/artifacts/ab_r3g.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date -u +%H:%M:%S)"
  timeout 1800 python bench.py "$@" 2> >(tail -2 >&2)
}

run baseline-default
run down1           --pallas-features hwnc,down1
run down12          --pallas-features hwnc,down1,down2
run io-s8           --hwnc-io s8
run conv2-scatter   --hwnc-conv2 scatter
run conv2-scatter16 --hwnc-conv2 scatter16
run conv2-acc       --hwnc-conv2 acc
run prep-bf16       --prep-stage1 bf16
run pipeline        --hwnc-pipeline
run hwncs           --pallas-features hwncs
run v2-stem         --pallas-features hwnc,stem
run pairs-2160      --pairs-per-step 2160
run band-12         --band-budget-mb 12
run band-3          --band-budget-mb 3
run int8c-hwnc      --dtype int8c --pallas-features hwnc,down,stem
run bf16-rebase     --dtype bf16
run combo-guess     --pallas-features hwnc,down1,down2,stem --hwnc-conv2 scatter --prep-stage1 bf16
echo "=== sweep done $(date -u +%H:%M:%S)"
