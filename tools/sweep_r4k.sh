#!/bin/bash
# Round-4 eleventh wave (contingency — launch manually only if the
# round is still alive after the r4h qpool adoption): hwncp (the
# lane-packed layer1 stage kernel, the remaining structural L1 fix:
# conv2 at K=768/N=128 full MXU width vs hwncs1d's K=576/N=64) and
# pairs-per-step 2160 at the adopted default. Interleaved vs the
# default for same-session controls.
# Usage: nohup bash tools/sweep_r4k.sh >> tools/artifacts/ab_r4.log 2>&1 &
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

echo "=== gate: hwncp $(date -u +%H:%M:%S)"
timeout 1800 python tools/tpu_gate.py --configs v2-hwncp \
  2> tools/artifacts/stderr_r4/gate-hwncp.err \
  | tee tools/artifacts/gate_r4_hwncp.log
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "=== gate hwncp FAILED (rc=$rc) — skipping hwncp benches"
  tail -20 tools/artifacts/stderr_r4/gate-hwncp.err
else
  run hwncp-a --pallas-features hwnc,down2,hwncp
  run default-j
  run hwncp-b --pallas-features hwnc,down2,hwncp
  run hwncp-c --pallas-features hwnc,down2,hwncp
fi

run pairs2160-a --pairs-per-step 2160
run default-k
run pairs2160-b --pairs-per-step 2160

echo "=== sweep r4k done $(date -u +%H:%M:%S)"
