#!/bin/bash
# Long-running training loop with crash auto-resume (checkpoint/metrics
# restore on restart).
# Usage: run_train_loop.sh <config> <prefix> <episodes> <log> [extra overrides...]
CONFIG=$1; PREFIX=$2; EPISODES=$3; LOG=$4; shift 4
cd /root/repo
for i in $(seq 1 1000); do
  python -m meshdqn_tpu.cli.train --config "$CONFIG" --episodes "$EPISODES" \
    prefix="$PREFIX" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "[loop] train exited rc=$rc at $(date)" >> "$LOG"
  if [ $rc -eq 0 ]; then break; fi
  sleep 10
done
