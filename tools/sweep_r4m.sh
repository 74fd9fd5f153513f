#!/bin/bash
# Round-4 thirteenth wave: pallas5 — the 5-channel fused prep kernel
# (mask nearest resize in-kernel as windowed one-hot matmuls; the
# einsum mask path moves ~2 GB/step of HBM that the RULED-OUT
# RGB-only kernel left untouched). Gate on hardware first, then
# interleaved A/B vs the adopted default (which now includes
# dirpack), plus a directions=1 composition (at d1 the trunk halves,
# so prep is a bigger slice).
# Usage: nohup bash tools/sweep_r4m.sh >> tools/artifacts/ab_r4.log 2>&1 &
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

echo "=== gate: pallas5 $(date -u +%H:%M:%S)"
timeout 1800 python tools/prep_gate.py --fuse-masks --passes 3 \
  2> tools/artifacts/stderr_r4/gate-pallas5.err \
  | tee tools/artifacts/gate_r4_pallas5.log
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "=== gate pallas5 FAILED (rc=$rc) — skipping pallas5 benches"
  tail -20 tools/artifacts/stderr_r4/gate-pallas5.err
  exit 1
fi

run pallas5-a --prep-rgb pallas5
run default-n
run pallas5-b --prep-rgb pallas5
run d1-pallas5-a --directions 1 --prep-rgb pallas5
run pallas5-c --prep-rgb pallas5

echo "=== sweep r4m done $(date -u +%H:%M:%S)"
