#!/bin/sh
# Persistent wrapper: retry the r4 measurement campaign through axon-relay
# oscillations (NOTES_r4 "Tunnel log"). The campaign itself probes the tunnel
# and checkpoints per-phase results; this loop just re-launches it until every
# requested phase has an ok result or MAX_TRIES is exhausted.
# Usage: sh tools/r4_campaign_loop.sh "phase1,phase2,..." [max_tries]
set -u
PHASES="$1"
MAX=${2:-40}
i=0
while [ "$i" -lt "$MAX" ]; do
    i=$((i + 1))
    echo "[loop] attempt $i/$MAX: $PHASES"
    python tools/r4_campaign.py --only "$PHASES"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[loop] campaign completed rc=0"
        exit 0
    fi
    echo "[loop] campaign rc=$rc (tunnel sick?); sleeping 240s"
    sleep 240
done
echo "[loop] gave up after $MAX attempts"
exit 1
