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
  JL="$RUN_DIR/train_log.jsonl"
  # Progress = EPISODE events only.  Init-time events (replay_restore,
  # gt cache notes) must not start the strict stall clock: a contended
  # first compile legitimately takes 15-25 min AFTER them, and counting
  # their mtime as "first event" made the watchdog kill healthy trainers
  # mid-compile (observed round 4: two kills at 633s/693s during a
  # 3-process compile pile-up).
  EPC0=$(grep -c '"event": "episode"' "$JL" 2>/dev/null || echo 0)
  EPC_LAST=$EPC0
  LAST_PROGRESS=$START
  while kill -0 $TPID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    EPC=$(grep -c '"event": "episode"' "$JL" 2>/dev/null || echo 0)
    if [ "$EPC" -gt "$EPC_LAST" ]; then
      EPC_LAST=$EPC
      LAST_PROGRESS=$NOW
    elif [ "$EPC" -gt "$EPC0" ] && [ $((NOW - LAST_PROGRESS)) -gt "$STALL_S" ]; then
      # Episodes were flowing in THIS invocation and stopped: hung device
      # call — kill and let the outer loop resume from the checkpoint.
      echo "[loop] stall: no episode for $((NOW - LAST_PROGRESS))s; killing $TPID" >> "$LOG"
      kill $TPID
    elif [ "$EPC" -le "$EPC0" ] && [ $((NOW - START)) -gt $((4 * STALL_S)) ]; then
      echo "[loop] stall: no first episode after $((NOW - START))s; killing $TPID" >> "$LOG"
      kill $TPID
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
