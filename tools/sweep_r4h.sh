#!/bin/bash
# Round-4 eighth wave: qpool — quantize BEFORE the stem max-pool
# (provably bit-exact: round/clip/relu and max are monotone). XLA then
# fuses the quantize into the conv epilogue and the pool reads s8
# instead of bf16 — 4x less HBM on the (N,128,128,128) plane. Gate
# (must be bitexact), then A/B at the hwncs1d point, then the all-in
# combo (hwncs1d + stem2 + qpool).
# Waits for the r4g marker so runs never overlap on the one chip.
# Usage: nohup bash tools/sweep_r4h.sh >> tools/artifacts/ab_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r4

for _ in $(seq 1 240); do
  grep -q 'sweep r4g done' tools/artifacts/ab_r4.log && break
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

echo "=== gate: qpool $(date -u +%H:%M:%S)"
timeout 1800 python tools/tpu_gate.py --configs v2-qpool \
  2> tools/artifacts/stderr_r4/gate-qpool.err \
  | tee tools/artifacts/gate_r4_qpool.log
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "=== gate qpool FAILED (rc=$rc) — skipping qpool benches"
  tail -20 tools/artifacts/stderr_r4/gate-qpool.err
  echo "=== sweep r4h done $(date -u +%H:%M:%S)"
  exit 1
fi

run qpool-a --pallas-features hwnc,down2,hwncs1d,qpool
run hwncs1d-e --pallas-features hwnc,down2,hwncs1d
run qpool-b --pallas-features hwnc,down2,hwncs1d,qpool
run allin-a --pallas-features hwnc,down2,hwncs1d,stem2,qpool
run allin-b --pallas-features hwnc,down2,hwncs1d,stem2,qpool

echo "=== sweep r4h done $(date -u +%H:%M:%S)"
