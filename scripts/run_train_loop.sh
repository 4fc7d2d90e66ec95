#!/bin/bash
# Long-running training loop with crash auto-resume AND stall watchdog.
# The remote-TPU link can hang a device call indefinitely (no episode events
# while the process stays alive); the watchdog kills the trainer when the
# JSONL event log goes stale and the outer loop resumes from the latest
# checkpoint.
# Usage: run_train_loop.sh <config> <prefix> <episodes> <log> [extra overrides...]
CONFIG=$1; PREFIX=$2; EPISODES=$3; LOG=$4; shift 4
cd /root/repo
RUN_DIR="training_results/${PREFIX%_}"
STALL_S=${STALL_S:-600}
mkdir -p "$RUN_DIR"
for i in $(seq 1 1000); do
  START=$(date +%s)
  python -m meshdqn_tpu.cli.train --config "$CONFIG" --episodes "$EPISODES" \
    prefix="$PREFIX" "$@" >> "$LOG" 2>&1 &
  TPID=$!
  # Liveness beacon for bench.py's pause logic (a long contended compile can
  # outlast any mtime window; the pid is the ground truth).
  echo $TPID > "$RUN_DIR/trainer.pid"
  while kill -0 $TPID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    JL="$RUN_DIR/train_log.jsonl"
    if [ -f "$JL" ]; then
      MT=$(stat -c %Y "$JL")
      # Only a stall if THIS invocation already produced events (mtime
      # after start AND file non-empty — the trainer creates the JSONL
      # empty at init, which must not count as a first event) and then
      # went quiet, or the run never produced any event for 3x the stall
      # window (covers hangs before first episode; fresh-prefix GT
      # compute + contended compiles legitimately take ~15-25 min).
      if [ ! -s "$JL" ]; then MT=$START; fi
      if [ "$MT" -gt "$START" ] && [ $((NOW - MT)) -gt "$STALL_S" ]; then
        echo "[loop] stall: no events for $((NOW - MT))s; killing $TPID" >> "$LOG"
        kill $TPID
      elif [ "$MT" -le "$START" ] && [ $((NOW - START)) -gt $((3 * STALL_S)) ]; then
        echo "[loop] stall: no first event after $((NOW - START))s; killing $TPID" >> "$LOG"
        kill $TPID
      fi
    fi
  done
  wait $TPID
  rc=$?
  rm -f "$RUN_DIR/trainer.pid"
  echo "[loop] train exited rc=$rc at $(date)" >> "$LOG"
  if [ $rc -eq 0 ]; then break; fi
  if [ $rc -eq 76 ]; then
    # Paused (trainer acked PAUSE -> PAUSED and exited losslessly).  Hold
    # the relaunch until the pauser removes the ack — but never forever:
    # pause_wait.sh auto-resumes on TTL expiry or a dead pauser pid (a
    # crashed bench.py left both trainers stalled for hours in round 3).
    echo "[loop] paused; waiting for PAUSED release" >> "$LOG"
    bash "$(dirname "$0")/pause_wait.sh" "$RUN_DIR" "$LOG"
    echo "[loop] resuming after pause at $(date)" >> "$LOG"
    continue
  fi
  sleep 10
done
