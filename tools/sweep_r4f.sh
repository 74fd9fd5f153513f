#!/bin/bash
# Round-4 sixth wave: stem2 — the 7x7/2 stem conv re-expressed over a
# 2x2 space-to-depth input (folding.s2d_conv1_w). The stock stem runs
# the MXU at ~26% of peak (Cin=5 starves the contraction dim; 6.6 ms
# of a 1.7 ms-at-peak conv, trace_r4_default.txt). Gate first (bf16
# reassociation only -> decision agreement must be 100%), then A/B at
# the hwncs1d operating point, interleaved to cancel session drift.
# Also: pairs-1620 at the hwncs1d point (1620 measured +0.7% at the
# hwncs1 default, 3x).
# Waits for the r4e sweep marker so runs never overlap on the one chip.
# Usage: nohup bash tools/sweep_r4f.sh >> tools/artifacts/ab_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r4

for _ in $(seq 1 240); do
  grep -q 'sweep r4e done' tools/artifacts/ab_r4.log && break
  sleep 30
done

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

echo "=== gate: stem2 $(date -u +%H:%M:%S)"
timeout 1800 python tools/tpu_gate.py --configs v2-stem2 \
  2> tools/artifacts/stderr_r4/gate-stem2.err \
  | tee tools/artifacts/gate_r4_stem2.log
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "=== gate stem2 FAILED (rc=$rc) — skipping stem2 benches"
  tail -20 tools/artifacts/stderr_r4/gate-stem2.err
else
  run stem2-a --pallas-features hwnc,down2,hwncs1d,stem2
  run hwncs1d-d --pallas-features hwnc,down2,hwncs1d
  run stem2-b --pallas-features hwnc,down2,hwncs1d,stem2
fi
run pairs1620-s1d --pallas-features hwnc,down2,hwncs1d --pairs-per-step 1620
run stem2-c --pallas-features hwnc,down2,hwncs1d,stem2
run pairs1620-s1d-b --pallas-features hwnc,down2,hwncs1d --pairs-per-step 1620

echo "=== sweep r4f done $(date -u +%H:%M:%S)"
