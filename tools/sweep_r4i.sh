#!/bin/bash
# Round-4 ninth wave: hwncp — layer1 stage on the parity-split view with
# LANE-PACKED identity 3x3s: at Cm=64 the unpacked conv2 matmul (K=576,
# N=64) runs the MXU at half lane width; packing two adjacent output
# pixels per row (K=768, N=128) runs full width for 1.33x the MACs —
# a 1.5x conv2 speedup on the L1 whale (trace: L1 at ~37% of MXU peak
# vs L2-4 at 89-100%). Gate first (scatter-style bar: packed K
# reassociates f32), then interleaved A/B vs hwncs1d.
# Waits for the r4h marker so runs never overlap on the one chip.
# Usage: nohup bash tools/sweep_r4i.sh >> tools/artifacts/ab_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r4

for _ in $(seq 1 240); do
  grep -q 'sweep r4h done' tools/artifacts/ab_r4.log && break
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

echo "=== gate: hwncp $(date -u +%H:%M:%S)"
timeout 1800 python tools/tpu_gate.py --configs v2-hwncp \
  2> tools/artifacts/stderr_r4/gate-hwncp.err \
  | tee tools/artifacts/gate_r4_hwncp.log
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "=== gate hwncp FAILED (rc=$rc) — skipping hwncp benches"
  tail -20 tools/artifacts/stderr_r4/gate-hwncp.err
  echo "=== sweep r4i done $(date -u +%H:%M:%S)"
  exit 1
fi

run hwncp-a --pallas-features hwnc,down2,hwncp
run hwncs1d-f --pallas-features hwnc,down2,hwncs1d
run hwncp-b --pallas-features hwnc,down2,hwncp
run hwncs1d-g --pallas-features hwnc,down2,hwncs1d
run hwncp-c --pallas-features hwnc,down2,hwncp

echo "=== sweep r4i done $(date -u +%H:%M:%S)"
