#!/bin/bash
# Round-5 epilogue sweep: the hwncp u4/bb tuning that wave 2 dropped for
# compile budget (the d1 10k ladder is complete, TPU idle). Decision:
# does partial band-loop unroll (--stage-unroll 4) buy back the ILP the
# fori_loop rewrite serialized (-2.6% x2 at u1)?
#
# NOTE: bench.py's no-flag default is now --profile serving-d1 (r5
# wave 5); every row pins its profile explicitly so this sweep stays
# comparable to the r5f/r5h ledger rows.
#
# Order: hardware bit-exactness gate for the tuned variants first
# (tools/tpu_gate.py small-shape configs), then interleaved A/Bs at d2
# and d1 on the adopted pallas5 base.
# Usage: nohup bash tools/sweep_r5i.sh >> tools/artifacts/ab_r5i.log 2>&1 &
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

# ---- gate: tuned-variant bit-exactness on hardware ----
echo "=== gate hwncp-u4 variants $(date -u +%H:%M:%S)"
timeout 3600 python tools/tpu_gate.py \
  --configs v2-hwncp-u4,v2-hwncp-dirpack-u4,v2-hwncp-dirpack-u4-bb12 \
  2> tools/artifacts/stderr_r5/gate-u4.err \
  | tee tools/artifacts/gate_r5_hwncp_u4.log
grep -q '"ok": false' tools/artifacts/gate_r5_hwncp_u4.log && {
  echo "=== GATE FAILED — aborting sweep"; exit 1; }

# ---- d2 interleave (pallas5 base is the serving-d2 default) ----
run 3600 d2-hwncp-u4-a $D2 --pallas-features $HWNCP --stage-unroll 4
run 2700 d2-base-a $D2
run 2700 d2-hwncp-u4-b $D2 --pallas-features $HWNCP --stage-unroll 4
run 3600 d2-hwncp-u4-bb24-a $D2 --pallas-features $HWNCP --stage-unroll 4 --band-budget-mb 24
run 2700 d2-base-b $D2

# ---- d1 interleave (only if u4 didn't lose at d2; cheap to just run) ----
run 3600 d1-hwncp-u4-a $D1 --pallas-features $HWNCP --stage-unroll 4
run 2700 d1-base-a $D1
run 2700 d1-hwncp-u4-b $D1 --pallas-features $HWNCP --stage-unroll 4

echo "=== sweep r5i done $(date -u +%H:%M:%S)"
