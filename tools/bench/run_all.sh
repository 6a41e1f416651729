#!/usr/bin/env bash
# Full on-chip verification sweep — run after any kernel/perf-relevant
# change (and after tunnel outages) from the repo root:
#
#   bash tools/bench/run_all.sh [outdir]
#
# Each step is bounded; results stream to <outdir>/<name>.log.
# Expected v5e-1 numbers live in CLAUDE.md / README.md "Performance".
set -u
OUT=${1:-runs/onchip_$(date +%Y%m%d_%H%M)}
mkdir -p "$OUT"
echo "logs -> $OUT"

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout 1800 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3
}

run doctor        python tools/doctor.py --probe-timeout 120 --json
run bench         python bench.py
run bench2        python bench.py     # cache-warm repeat (tunnel spread)
run precision     python tools/bench/precision_modes.py
run microbench    python tools/bench/microbench_attention.py
run kinetics      python tools/bench/kinetics_propagation.py
run train_step    python tools/bench/train_step.py
run vos_fullres   python tools/bench/vos_fullres_check.py
echo "sweep complete: $OUT"
