#!/bin/bash
# Final round-5 sweep at settled defaults (dense-maxpool downsample with
# cells<=1024V gate, GS=9 walks, unpacked-when-fits dispatch, host-fetch
# 2N-minus-N harness everywhere). COMMIT the output.
# Usage: bash tools/measure_final_r5.sh [outfile]
set -u
OUT=${1:-/tmp/measure_final_r5.log}
cd "$(dirname "$0")/.."
: > "$OUT"
run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 2400 env "$@" 2>&1 | grep -v "xla_bridge" | tail -6 | tee -a "$OUT"
  echo | tee -a "$OUT"
}
# attribution first (decides any remaining kernel work)
run python tools/profile_stages.py uni3detr_sunrgbd
run python tools/profile_encoder_r5.py uni3detr_sunrgbd
# KITTI downsample-route A/B (gate check: default=sort at KITTI scale)
run python bench.py uni3detr_kitti_car
run UNI3DETR_DOWNSAMPLE=dense python bench.py uni3detr_kitti_car
# remaining flagship presets at final defaults
run python bench.py uni3detr_scannet_large
run python bench.py ov_uni3detr_sunrgbd_mm
# train steps (r2 bars)
run python bench_train.py uni3detr_sunrgbd 2
run python bench_train.py uni3detr_kitti_car 2
echo DONE | tee -a "$OUT"
