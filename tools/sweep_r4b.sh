#!/bin/bash
# Round-4 second wave: stage-fusion configs at the down12 default
# operating point (gate v2-hwncs1 / v2-hwncs-all first — only measure
# what agrees bit-exactly). Chain after tools/sweep_r4.sh.
# Usage: nohup bash tools/sweep_r4b.sh >> tools/artifacts/ab_r4.log 2>&1 &
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

echo "=== gate: hwncs-all $(date -u +%H:%M:%S)"
timeout 1800 python tools/tpu_gate.py --configs v2-hwncs-all \
  2> tools/artifacts/stderr_r4/gate-hwncs-all.err \
  || { echo "=== gate hwncs-all FAILED"; \
       tail -5 tools/artifacts/stderr_r4/gate-hwncs-all.err; }

run hwncs1-repeat     --pallas-features hwnc,down1,down2,hwncs1
run hwncs-all         --pallas-features hwnc,down1,down2,hwncs,hwncs1
run hwncs24           --pallas-features hwnc,down1,down2,hwncs
run default-d
echo "=== sweep r4b done $(date -u +%H:%M:%S)"
