#!/bin/bash
# Periodically snapshot live training runs into committed resume packs.
#
# The build VM can be recycled at any moment and training_results/ is
# gitignored (replay rings / event logs), so anything not packed into
# checkpoints/ (scripts/snapshot_checkpoint.py) is lost with the machine.
# This loop bounds the loss to one pack interval.  It commits ONLY the
# checkpoints/ tree and skips the commit when nothing changed.
# Usage: autopack.sh [interval_s] [run ...]   (default 300s, all runs)
set -u
cd /root/repo
INTERVAL=${1:-300}
shift || true
while true; do
  sleep "$INTERVAL"
  if [ $# -gt 0 ]; then
    for run in "$@"; do python scripts/snapshot_checkpoint.py save "$run"; done
  else
    for d in training_results/*/; do
      run=$(basename "$d")
      [ -d "$d/ckpt" ] && python scripts/snapshot_checkpoint.py save "$run"
    done
  fi
  git add checkpoints/ 2>/dev/null
  if ! git diff --cached --quiet -- checkpoints/; then
    git commit -q -m "Autopack: refresh training resume packs

No-Verification-Needed: checkpoint-data-only pack sync" -- checkpoints/
  fi
done
