#!/bin/bash
# Deployment driver loop: relaunch cli.deploy across process recycles.
#
# The axon remote-TPU client degrades superlinearly as IPCSSolver instances
# accumulate (docs/AXON.md; measured re-sim wall 27.6 -> 123.1 s over four
# consecutive removals, r5).  cli.deploy --recycle-every N exits 75 after N
# re-simulations with its per-step resume state saved; this loop relaunches
# with --restart until the deployment finishes (exit 0) or genuinely fails.
#
# Usage: scripts/run_deploy.sh <config.yaml> [extra cli.deploy args...]
# The first launch omits --restart unless a resume file already exists.
set -u
CONFIG="$1"; shift
MAX_RELAUNCH="${MAX_RELAUNCH:-60}"
RESTART_FLAG=""
for i in $(seq 0 "$MAX_RELAUNCH"); do
    # shellcheck disable=SC2086
    python -m meshdqn_tpu.cli.deploy --config "$CONFIG" $RESTART_FLAG "$@"
    rc=$?
    if [ "$rc" -eq 75 ]; then
        echo "run_deploy: recycle (relaunch $((i + 1)))" >&2
        RESTART_FLAG="--restart"
        sleep 2
        continue
    fi
    exit "$rc"
done
echo "run_deploy: exceeded MAX_RELAUNCH=$MAX_RELAUNCH" >&2
exit 1
