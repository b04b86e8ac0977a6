#!/bin/bash
# Stall-tolerant training wrapper (VERDICT r4 next-2): the remote-TPU
# tunnel has twice wedged long runs mid-iteration (round 4 lost two runs
# to it). This wrapper watches $OUT/curve.jsonl and, when no iteration
# record lands for STALL_MIN minutes (default 10 -- comfortably above the
# ~1 min/iter cadence and the 4-6 min first compile), kills the EXACT
# child PID (never a pattern) and relaunches; the training CLI resumes
# from the latest checkpoint in $OUT (pass --light_ckpt --ckpt_every N
# so restarts are cheap).
#
# Usage:
#   OUT=results/run STALL_MIN=10 MAX_RESTARTS=20 \
#     bash tools/run_with_autoresume.sh python -u -m examples.train_learning_curve --out results/run ...
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:?set OUT to the run dir (must match --out)}
STALL_SEC=$(( ${STALL_MIN:-10} * 60 ))
# First-iteration grace: compile of the training/eval programs through
# the remote tunnel can take 15-25 min before the first curve record
# lands (measured 2x 10-min kill-loops before this knob existed).
GRACE_SEC=$(( ${GRACE_MIN:-30} * 60 ))
MAX_RESTARTS=${MAX_RESTARTS:-20}

restarts=0
while :; do
  launch_ts=$(date +%s)
  "$@" &
  pid=$!
  stalled=0
  # NB: grep -c prints "0" itself on zero matches (exit 1), so a
  # `|| echo 0` fallback would produce the two-line string "0\n0" and
  # break the -le integer comparison below; only the missing-file case
  # needs the fallback, and `|| true` keeps the printed count intact.
  recs_at_launch=$(grep -c '"iteration"' "$OUT/curve.jsonl" 2>/dev/null || true)
  recs_at_launch=${recs_at_launch:-0}
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    mtime=$(stat -c %Y "$OUT/curve.jsonl" 2>/dev/null || echo 0)
    now=$(date +%s)
    last=$(( mtime > launch_ts ? mtime : launch_ts ))
    recs=$(grep -c '"iteration"' "$OUT/curve.jsonl" 2>/dev/null || true)
    recs=${recs:-0}
    # Until this launch has produced an iteration record, allow the long
    # compile grace; afterwards the tight stall window applies.
    limit=$STALL_SEC
    if [ "$recs" -le "$recs_at_launch" ]; then limit=$GRACE_SEC; fi
    if [ $(( now - last )) -gt "$limit" ]; then
      echo "[autoresume] stall: no curve record for $(( now - last ))s (limit ${limit}s), killing pid $pid" >&2
      kill -9 "$pid" 2>/dev/null
      stalled=1
      break
    fi
  done
  wait "$pid"; rc=$?
  if [ "$stalled" -eq 0 ] && [ "$rc" -eq 0 ]; then
    echo "[autoresume] clean exit after $restarts restart(s)"
    break
  fi
  restarts=$(( restarts + 1 ))
  if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
    echo "[autoresume] giving up after $MAX_RESTARTS restarts" >&2
    exit 1
  fi
  echo "[autoresume] restart #$restarts (rc=$rc, stalled=$stalled)" >&2
  sleep 10
done
