#!/bin/bash
# Round-5 consolidated priority sweep (session restart #2; .jax_cache
# wiped again — every program compiles cold). Supersedes sweep_r5c/d/e:
# one prioritized order so the decisions that matter land first even if
# wall clock runs out mid-sweep.
#   A) cache warms for every unique program (numbers not adoption-grade)
#   B1) pallas5 adoption at d2 (needs >=2 clean interleaved; wave 1 has
#       one: 5,865 vs default 5,530)
#   B2) d1 10k ladder: pallas5 base vs --pairs-per-step 3240 (restores
#       the d2-equivalent trunk batch; the r4 saturation result was
#       d2-only) vs --prep-precision default (1-pass bf16 RGB, masks
#       stay bit-exact) and their combo
#   C) hwncp u4 partial-unroll tuning on the pallas5 base (wave-1
#       fori_loop default was -2.6%; unroll buys back ILP)
# Usage: nohup bash tools/sweep_r5f.sh >> tools/artifacts/ab_r5f.log 2>&1 &
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

P5="--prep-rgb pallas5"
D1="--profile serving-d1"
HWNCP="hwnc,down2,hwncp,dirpack"

# ---- phase A: cold-compile cache warms ----
run 1800 warm-default
run 5400 warm-pallas5 $P5
run 1800 warm-d1-default $D1
run 5400 warm-d1-pallas5 $D1 $P5
run 5400 warm-d1-p5-3240 $D1 $P5 --pairs-per-step 3240
run 3600 warm-d1-p5-pp1 $D1 $P5 --prep-precision default

# ---- phase B1: pallas5 adoption at d2 ----
run 2700 pallas5-c $P5
run 2700 default-f
run 2700 pallas5-d $P5

# ---- phase B2: d1 ladder ----
run 2700 d1-p5-base-a $D1 $P5
run 2700 d1-p5-3240-a $D1 $P5 --pairs-per-step 3240
run 2700 d1-p5-pp1-a $D1 $P5 --prep-precision default
run 2700 d1-p5-base-b $D1 $P5
run 5400 d1-p5-3240-pp1-a $D1 $P5 --pairs-per-step 3240 --prep-precision default
run 2700 d1-p5-3240-b $D1 $P5 --pairs-per-step 3240
run 2700 d1-p5-pp1-b $D1 $P5 --prep-precision default
run 2700 d1-p5-3240-pp1-b $D1 $P5 --pairs-per-step 3240 --prep-precision default
run 2700 d1-default-c $D1

# ---- phase C: hwncp u4 tuning on the pallas5 base ----
run 3600 p5-hwncp-u4-a $P5 --pallas-features $HWNCP --stage-unroll 4
run 2700 pallas5-e $P5
run 2700 p5-hwncp-u4-b $P5 --pallas-features $HWNCP --stage-unroll 4
run 3600 p5-hwncp-bb24-u4-a $P5 --pallas-features $HWNCP --band-budget-mb 24 --stage-unroll 4
run 3600 d1-p5-hwncp-u4-a $D1 $P5 --pallas-features $HWNCP --stage-unroll 4

echo "=== sweep r5f done $(date -u +%H:%M:%S)"
