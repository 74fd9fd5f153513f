#!/bin/bash
# Round-5 sweep, take 3 (VM rebooted at 05:28 mid-sweep-r5f; .jax_cache
# has only the default-config programs the killed warm-default run left
# behind). Trimmed + reordered from r5f so each DECISION completes as a
# unit before the next starts:
#   1) pallas5 adoption at d2 (wave 1 has one clean sample: 5,865 vs
#      5,530 default; need >=2 interleaved) -> flips bench.py default,
#      which is what the driver's end-of-round BENCH run measures.
#   2) d1 10k ladder: d1+pallas5 first number, then the two levers that
#      can close the remaining gap (--pairs-per-step 3240 restoring the
#      d2-equivalent trunk batch, --prep-precision default 1-pass bf16
#      RGB), then the combo, then reproduction of the best.
# DROPPED from r5f: hwncp u4/band-budget tuning. hwncp is -2.6% twice
# (fori_loop serializes the band loop); u4 is speculative and each
# variant costs a long cold compile we cannot afford post-reboot.
# Usage: nohup bash tools/sweep_r5g.sh >> tools/artifacts/ab_r5g.log 2>&1 &
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

# ---- decision 1: pallas5 at d2 (default flip) ----
run 1800 default-e                     # cache is warm for this; fast
run 7200 warm-pallas5 $P5              # the >30min cold compile
run 2700 pallas5-c $P5
run 2700 default-f
run 2700 pallas5-d $P5

# ---- decision 2: d1 ladder toward 10k ----
run 7200 warm-d1-pallas5 $D1 $P5
run 7200 warm-d1-p5-3240 $D1 $P5 --pairs-per-step 3240
run 5400 warm-d1-p5-pp1 $D1 $P5 --prep-precision default
run 5400 d1-p5-3240-pp1-a $D1 $P5 --pairs-per-step 3240 --prep-precision default
run 2700 d1-default-c $D1              # same-session d1 baseline
run 2700 d1-p5-base-b $D1 $P5

# ---- decision 3: reproduce the ladder winners ----
run 2700 d1-p5-3240-b $D1 $P5 --pairs-per-step 3240
run 2700 d1-p5-pp1-b $D1 $P5 --prep-precision default
run 2700 d1-p5-3240-pp1-b $D1 $P5 --pairs-per-step 3240 --prep-precision default

echo "=== sweep r5g done $(date -u +%H:%M:%S)"
