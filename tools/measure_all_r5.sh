#!/bin/bash
# Round-5 measurement batch (VERDICT r4 #1/#5/#6): every TPU number the
# STATUS.md round-5 table needs, one job at a time (1-core machine —
# concurrent compiles starve each other). COMMIT the output.
# Usage: bash tools/measure_all_r5.sh [outfile]
set -u
OUT=${1:-/tmp/measure_r5.log}
cd "$(dirname "$0")/.."
: > "$OUT"
run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 3000 "$@" 2>&1 | tail -10 | tee -a "$OUT"
  echo | tee -a "$OUT"
}
# e2e inference across all five flagship presets
run python bench.py uni3detr_sunrgbd
run python bench.py uni3detr_kitti_car
run python bench.py uni3detr_nuscenes
run python bench.py uni3detr_scannet_large
run python bench.py ov_uni3detr_sunrgbd_mm
# train steps (r2 bars: sunrgbd <=150 ms bs2, kitti <=500 ms bs2)
run python bench_train.py uni3detr_sunrgbd 2
run python bench_train.py uni3detr_kitti_car 2
# stage profiles (fresh breakdown, clustered inputs)
run python tools/profile_stages.py uni3detr_sunrgbd
run python tools/profile_stages.py uni3detr_nuscenes
# on-TPU auction optimality gap at production shapes
run python tools/measure_matcher_tpu.py
# spatial-sharding 1-chip constraint overhead (VERDICT r4 #6; the
# 8-virtual-CPU scaling table comes from the same tool under JAX_PLATFORMS=cpu)
run python tools/measure_spatial_sharding.py
# kernel-level attribution + tuning sweeps (honest host-fetch harness)
run python tools/profile_encoder_r5.py uni3detr_sunrgbd
run python tools/measure_tile_stages.py
run python tools/measure_sort.py
echo DONE | tee -a "$OUT"
