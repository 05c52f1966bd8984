#!/usr/bin/env bash
# Capability target: HBB_TOD/tools/dist_test.sh. Evaluation shards over all
# visible chips automatically (tools/test.py); no launcher needed.
CONFIG=$1
CKPT=$2
shift 2
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
