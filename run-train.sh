#!/usr/bin/env bash
# One-line launcher, counterpart of the reference's run-train.sh
# (/root/reference/run-train.sh:13-19): pick a settings file, train on the
# default dataset. Any extra arguments pass straight through to the driver
# (e.g. --max-iterations, --mesh N, --negative-mode split).
#
#   bash run-train.sh settings/gcn_block.exp [extra driver args...]
#
# DATASET defaults to the FB15k-237 checkout directory when its train split
# is present, else the scale-matched synthetic stand-in (this environment's
# public checkout ships no train splits).
set -euo pipefail

SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
SETTINGS=${1:?usage: run-train.sh <settings.exp> [driver args...]}
shift || true

if [ -z "${DATASET:-}" ]; then
    if [ -f "$SCRIPT_DIR/data/FB-Toutanova/train.txt" ]; then
        DATASET="$SCRIPT_DIR/data/FB-Toutanova"
    else
        DATASET="synth:FB15k-237"
    fi
fi

exec python3 -u "$SCRIPT_DIR/train.py" \
    --settings "$SETTINGS" --dataset "$DATASET" "$@"

# Multi-host launch (one line per host; process 0 binds the coordinator):
#   python3 train.py --settings settings/gcn_block.exp --dataset <dir> \
#       --coordinator host0:8476 --num-processes 4 --process-id $RANK \
#       --mesh 16
