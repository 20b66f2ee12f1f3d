#!/bin/bash
# Round-3 measurement batch: run every TPU number STATUS.md needs, one
# job at a time (1-core machine -- concurrent compiles starve each
# other). Usage: bash tools/measure_all_r3.sh [outfile]
set -u
OUT=${1:-/tmp/measure_r3.log}
cd "$(dirname "$0")/.."
: > "$OUT"
run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 2400 "$@" 2>&1 | tail -8 | tee -a "$OUT"
  echo | tee -a "$OUT"
}
run python bench.py uni3detr_sunrgbd
run python bench_train.py uni3detr_sunrgbd
run python bench_train.py uni3detr_kitti_car
run python bench.py uni3detr_kitti_car
run python bench.py uni3detr_nuscenes
run python tools/profile_stages.py uni3detr_sunrgbd
run python tools/profile_stages.py uni3detr_nuscenes
echo DONE | tee -a "$OUT"
