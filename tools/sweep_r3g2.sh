#!/bin/bash
# Round-3 second-wave A/B sweep, reordered for a short wall-clock window:
# highest-leverage configs first; int8c-hwnc dropped (known Mosaic
# remote-compile 500 on hardware — see tools/artifacts/gate_r3g.log).
# Usage: nohup bash tools/sweep_r3g2.sh >> tools/artifacts/ab_r3g.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date -u +%H:%M:%S)"
  timeout 1500 python bench.py "$@" 2> >(tail -2 >&2)
}

run baseline-default
run combo-guess     --pallas-features hwnc,down1,down2,stem --hwnc-conv2 scatter --prep-stage1 bf16
run down12          --pallas-features hwnc,down1,down2
run v2-stem         --pallas-features hwnc,stem
run conv2-scatter16 --hwnc-conv2 scatter16
run pipeline        --hwnc-pipeline
run prep-bf16       --prep-stage1 bf16
run down1           --pallas-features hwnc,down1
run conv2-scatter   --hwnc-conv2 scatter
run io-s8           --hwnc-io s8
run hwncs           --pallas-features hwncs
run pairs-2160      --pairs-per-step 2160
run band-12         --band-budget-mb 12
run band-3          --band-budget-mb 3
run bf16-rebase     --dtype bf16
echo "=== sweep done $(date -u +%H:%M:%S)"
