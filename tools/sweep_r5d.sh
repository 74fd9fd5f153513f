#!/bin/bash
# Round-5 wave 3 (restart-adjusted): the machine reset wiped .jax_cache,
# so every config compiles cold again — pallas5's first bench-scale
# compile previously exceeded 30 min (ab_r5.log pallas5-a rc=124).
# Phase A runs each unique config once with a generous timeout purely to
# fill the persistent compile cache (numbers recorded but not
# adoption-grade); phase B is the interleaved decision matrix:
#   1) pallas5 adoption at d2 (needs >=2 clean interleaved samples;
#      wave 1 has one: 5,865 vs default 5,530)
#   2) hwncp tuning on the pallas5 base (u4 partial unroll, band
#      budgets 12/24MB) — fori_loop serializes bands; unroll buys ILP
#   3) d1 ladder for the 10k push
# Usage: nohup bash tools/sweep_r5d.sh >> tools/artifacts/ab_r5d.log 2>&1 &
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

HWNCP="hwnc,down2,hwncp,dirpack"
P5="--prep-rgb pallas5"

# ---- phase A: cold-compile warmers (one per unique program) ----
run 1800 warm-default
run 5400 warm-pallas5 $P5
run 3600 warm-p5-hwncp-u4 $P5 --pallas-features $HWNCP --stage-unroll 4
run 1800 warm-d1-default --profile serving-d1
run 5400 warm-d1-pallas5 --profile serving-d1 $P5

# ---- phase B1: pallas5 adoption at d2 (interleaved, cached) ----
run 2700 pallas5-c $P5
run 2700 default-f
run 2700 pallas5-d $P5
run 2700 default-g

# ---- phase B2: hwncp tuning on the pallas5 base ----
run 2700 p5-hwncp-u4-a $P5 --pallas-features $HWNCP --stage-unroll 4
run 2700 pallas5-e $P5
run 3600 p5-hwncp-bb12-u4-a $P5 --pallas-features $HWNCP --band-budget-mb 12 --stage-unroll 4
run 2700 p5-hwncp-u4-b $P5 --pallas-features $HWNCP --stage-unroll 4
run 3600 p5-hwncp-bb24-u2-a $P5 --pallas-features $HWNCP --band-budget-mb 24 --stage-unroll 2

# ---- phase B3: d1 ladder for the 10k push ----
run 2700 d1-pallas5-b --profile serving-d1 $P5
run 2700 d1-default-c --profile serving-d1
run 2700 d1-pallas5-c --profile serving-d1 $P5
run 3600 d1-p5-hwncp-u4-a --profile serving-d1 $P5 --pallas-features $HWNCP --stage-unroll 4
run 2700 d1-pallas5-d --profile serving-d1 $P5
run 3600 d1-p5-hwncp-u4-b --profile serving-d1 $P5 --pallas-features $HWNCP --stage-unroll 4

echo "=== sweep r5d done $(date -u +%H:%M:%S)"
