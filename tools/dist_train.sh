#!/usr/bin/env bash
# Reference-parity launcher (/root/reference/tools/dist_train.sh):
#   bash tools/dist_train.sh NPROCS [train.py args...]
# Spawns NPROCS coordinated processes of tools/train.py on this machine.
set -eu
NPROCS=$1
shift
HERE=$(dirname "$0")
exec python "$HERE/launch.py" --nprocs "$NPROCS" -- \
    python "$HERE/train.py" "$@"
