#!/bin/bash
# Hold while a PAUSE/PAUSED ack exists in RUN_DIR — with an escape hatch.
#
# The round-3 failure mode: bench.py pauses the trainers (PAUSE -> PAUSED
# handshake, trainer exits 76) and then dies without removing the ack;
# run_train_loop.sh waited unconditionally and both trainers sat stalled
# for hours (VERDICT r3 #5).  This wait auto-resumes when either
#   * the ack is older than PAUSE_TTL_S (default 1800 s), or
#   * the pauser pid recorded inside the ack file (bench.py writes its own
#     pid into PAUSE; the trainer's os.replace preserves it) is dead and
#     the ack is older than PAUSE_DEAD_GRACE_S (default 60 s).
# Usage: pause_wait.sh <run_dir> [log]
RUN_DIR=$1; LOG=${2:-/dev/null}
PAUSE_TTL_S=${PAUSE_TTL_S:-1800}
PAUSE_DEAD_GRACE_S=${PAUSE_DEAD_GRACE_S:-60}
PAUSE_POLL_S=${PAUSE_POLL_S:-5}
while [ -f "$RUN_DIR/PAUSED" ] || [ -f "$RUN_DIR/PAUSE" ]; do
  sleep "$PAUSE_POLL_S"
  ACK="$RUN_DIR/PAUSED"; [ -f "$ACK" ] || ACK="$RUN_DIR/PAUSE"
  [ -f "$ACK" ] || break
  AGE=$(( $(date +%s) - $(stat -c %Y "$ACK") ))
  OWNER=$(head -c 32 "$ACK" 2>/dev/null | tr -dc '0-9')
  if [ "$AGE" -gt "$PAUSE_TTL_S" ]; then
    echo "[loop] pause TTL exceeded (${AGE}s); auto-resuming" >> "$LOG"
    rm -f "$RUN_DIR/PAUSED" "$RUN_DIR/PAUSE"
  elif [ -n "$OWNER" ] && [ "$AGE" -gt "$PAUSE_DEAD_GRACE_S" ] \
       && ! kill -0 "$OWNER" 2>/dev/null; then
    echo "[loop] pauser pid $OWNER dead (${AGE}s old ack); auto-resuming" >> "$LOG"
    rm -f "$RUN_DIR/PAUSED" "$RUN_DIR/PAUSE"
  fi
done
