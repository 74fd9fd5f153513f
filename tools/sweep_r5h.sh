#!/bin/bash
# Round-5 sweep, take 4. Discovered while launching r5g that the r5f
# sweep had been auto-relaunched at 05:49 and was mid warm-pallas5 —
# two sweeps racing the TPU. Killed both parents + the duplicate
# default run, kept r5f's in-flight warm-pallas5 child (its stdout
# appends to ab_r5f.log; warm-default there = 5,530.0, matching the
# r4 default exactly post-reboot). This script WAITS for that child,
# then runs the r5g decision sequence:
#   1) pallas5 d2 adoption interleave (wave 1: 5,865 vs 5,530)
#   2) d1 10k ladder (pallas5 / +pairs 3240 / +prep-precision default)
#   3) reproduction of the ladder winners
# Usage: nohup bash tools/sweep_r5h.sh <warm_pid> >> tools/artifacts/ab_r5h.log 2>&1 &
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/artifacts/stderr_r5

WPID="${1:-}"
if [ -n "$WPID" ]; then
  echo "=== waiting for warm-pallas5 pid $WPID $(date -u +%H:%M:%S)"
  while kill -0 "$WPID" 2>/dev/null; do sleep 20; done
  echo "=== warm-pallas5 done $(date -u +%H:%M:%S)"
fi

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
run 2700 pallas5-c $P5
run 2700 default-f
run 2700 pallas5-d $P5

# ---- decision 2: d1 ladder toward 10k ----
run 7200 warm-d1-pallas5 $D1 $P5
run 7200 warm-d1-p5-3240 $D1 $P5 --pairs-per-step 3240
run 5400 warm-d1-p5-pp1 $D1 $P5 --prep-precision default
run 5400 d1-p5-3240-pp1-a $D1 $P5 --pairs-per-step 3240 --prep-precision default
run 2700 d1-default-c $D1
run 2700 d1-p5-base-b $D1 $P5

# ---- decision 3: reproduce the ladder winners ----
run 2700 d1-p5-3240-b $D1 $P5 --pairs-per-step 3240
run 2700 d1-p5-pp1-b $D1 $P5 --prep-precision default
run 2700 d1-p5-3240-pp1-b $D1 $P5 --pairs-per-step 3240 --prep-precision default

echo "=== sweep r5h done $(date -u +%H:%M:%S)"
