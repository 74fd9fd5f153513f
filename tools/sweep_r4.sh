#!/bin/bash
# Round-4 A/B sweep: confirm the r3g winner (hwnc,down1,down2 — now the
# default), measure winner combos VERDICT item 2 asked for, and probe
# batch scaling. Each run's stderr goes to a per-run file and is tailed
# synchronously after the run; nonzero exit codes are explicit in the
# log (ADVICE r3 items 1+2).
# Usage: nohup bash tools/sweep_r4.sh >> tools/artifacts/ab_r4.log 2>&1 &
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

run default-a
run hwncs1            --pallas-features hwnc,down1,down2,hwncs1
run pairs-2160        --pairs-per-step 2160
run down12-prep-bf16  --prep-stage1 bf16
run pairs-1620        --pairs-per-step 1620
run default-b
run down12-band-12    --band-budget-mb 12
run pairs-540         --pairs-per-step 540
run down12-stem       --pallas-features hwnc,down1,down2,stem
run bt-24             --bt-budget-mb 24
run default-c
echo "=== sweep done $(date -u +%H:%M:%S)"
