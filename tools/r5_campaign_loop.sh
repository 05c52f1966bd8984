#!/bin/sh
# Persistent wrapper: retry the r5 measurement campaign through axon-relay
# oscillations (NOTES_r4 "Tunnel log"). The campaign itself probes the tunnel
# and checkpoints per-phase results; this loop just re-launches it until every
# requested phase has an ok result or MAX_TRIES is exhausted.
# Usage: sh tools/r5_campaign_loop.sh [phases-or-all] [max_tries]
set -u
PHASES="${1:-all}"
MAX=${2:-60}
i=0
while [ "$i" -lt "$MAX" ]; do
    i=$((i + 1))
    echo "[loop] attempt $i/$MAX: $PHASES"
    if [ "$PHASES" = "all" ]; then
        python tools/r5_campaign.py
    else
        python tools/r5_campaign.py --only "$PHASES"
    fi
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
