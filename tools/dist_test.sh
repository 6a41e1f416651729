#!/usr/bin/env bash
# Reference-parity launcher (/root/reference/tools/dist_test.sh):
#   bash tools/dist_test.sh NPROCS [test.py args...]
# e.g.  bash tools/dist_test.sh 2 --task davis --data-root <dir> --platform cpu
set -eu
NPROCS=$1
shift
HERE=$(dirname "$0")
exec python "$HERE/launch.py" --nprocs "$NPROCS" -- \
    python "$HERE/test.py" "$@"
