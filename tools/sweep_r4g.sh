#!/bin/bash
# Round-4 seventh wave: trace forensics.
# 1) int8c trace — decides the int8c route's fate (VERDICT item 5): if
#    the s8 identity kernels at L2-4 run ~2x faster than their bf16-
#    compute v2 twins, Mosaic engages the int8 MXU mode and int8c's
#    loss is epilogue cost (fixable); if they run at the same speed,
#    the int8 MXU never engages and int8c is formally descoped.
# 2) fresh v2 trace at the hwncs1d operating point (the L1 whale after
#    stage+projection fusion).
# Waits for the r4f sweep marker so runs never overlap on the one chip.
# Usage: nohup bash tools/sweep_r4g.sh >> tools/artifacts/ab_r4.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r4

for _ in $(seq 1 240); do
  grep -q 'sweep r4f done' tools/artifacts/ab_r4.log && break
  sleep 30
done

echo "=== trace: int8c-hwnc $(date -u +%H:%M:%S)"
timeout 1800 python tools/trace_report.py --dtype int8c \
  --pallas-features hwnc,down \
  > tools/artifacts/trace_r4_int8c.txt \
  2> tools/artifacts/stderr_r4/trace-int8c.err
rc=$?
[ $rc -ne 0 ] && { echo "=== trace int8c FAILED (rc=$rc)"; tail -20 tools/artifacts/stderr_r4/trace-int8c.err; }

echo "=== trace: v2-hwncs1d $(date -u +%H:%M:%S)"
timeout 1800 python tools/trace_report.py --dtype int8 \
  --pallas-features hwnc,down2,hwncs1d \
  > tools/artifacts/trace_r4_hwncs1d.txt \
  2> tools/artifacts/stderr_r4/trace-hwncs1d.err
rc=$?
[ $rc -ne 0 ] && { echo "=== trace hwncs1d FAILED (rc=$rc)"; tail -20 tools/artifacts/stderr_r4/trace-hwncs1d.err; }

echo "=== sweep r4g done $(date -u +%H:%M:%S)"
