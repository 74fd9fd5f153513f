#!/bin/bash
# Round-4 fifth wave: hwncs1d — ALL of layer1 (stride-1 projection +
# identity pair) as ONE stage-fused pallas call, the projection output
# staged in the act scratch instead of a (64,64,N,256) s8 HBM round
# trip. Hardware bit-exactness gate first, then A/B vs the default,
# interleaved to cancel session drift.
# Waits for the r4d sweep marker so runs never overlap on the one chip.
# Usage: nohup bash tools/sweep_r4e.sh >> tools/artifacts/ab_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r4

for _ in $(seq 1 240); do
  grep -q 'sweep r4d done' tools/artifacts/ab_r4.log && break
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

echo "=== gate: hwncs1d $(date -u +%H:%M:%S)"
timeout 1800 python tools/tpu_gate.py --configs v2-hwncs1d \
  2> tools/artifacts/stderr_r4/gate-hwncs1d.err \
  | tee tools/artifacts/gate_r4_hwncs1d.log
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "=== gate hwncs1d FAILED (rc=$rc) — skipping bench"
  tail -20 tools/artifacts/stderr_r4/gate-hwncs1d.err
  echo "=== sweep r4e done $(date -u +%H:%M:%S)"
  exit 1
fi

run hwncs1d-a --pallas-features hwnc,down2,hwncs1d
run default-g
run hwncs1d-b --pallas-features hwnc,down2,hwncs1d
run default-h
run hwncs1d-c --pallas-features hwnc,down2,hwncs1d

echo "=== sweep r4e done $(date -u +%H:%M:%S)"
