#!/bin/bash
# Resume of sweep_r5i.sh: the round ended right after its hardware gate
# passed (gate_r5_hwncp_u4.log — all three u4 variants BIT-exact) and
# before any A/B row completed. This script runs only the A/B rows,
# interleaved, trimmed to fit the continuation session's budget:
# decision first at d2 (u4 vs base), then d1 only if time remains.
# Usage: nohup bash tools/sweep_r5i2.sh >> tools/artifacts/ab_r5i.log 2>&1 &
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

D2="--profile serving-d2"
D1="--profile serving-d1"
HWNCP="hwnc,down2,hwncp,dirpack"

run 3600 d2-hwncp-u4-a $D2 --pallas-features $HWNCP --stage-unroll 4
run 2700 d2-base-a $D2
run 2700 d2-hwncp-u4-b $D2 --pallas-features $HWNCP --stage-unroll 4
run 2700 d2-base-b $D2
run 3600 d1-hwncp-u4-a $D1 --pallas-features $HWNCP --stage-unroll 4
run 2700 d1-base-a $D1
run 2700 d1-hwncp-u4-b $D1 --pallas-features $HWNCP --stage-unroll 4

echo "=== sweep r5i2 done $(date -u +%H:%M:%S)"
