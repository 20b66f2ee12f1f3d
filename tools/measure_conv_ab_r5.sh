#!/bin/bash
# Round-5 honest e2e A/B of the sparse-conv kernel knobs, decided on
# bench.py itself (host-fetch, 2N-minus-N harness — the only evaluator
# immune to the axon block_until_ready issue):
#   - UNI3DETR_WALK_GROUP: offsets per window walk (1 = per-offset).
#     The GS=3/9 rejection in _group_size's docstring was measured with
#     the broken BUR harness — re-decided here.
#   - UNI3DETR_CONV_KERNEL=packed_c32: lane-packed kernel for C>=32
#     stages (honest tile sweep showed packed T=512 beating unpacked
#     at C>=32).
# Usage: bash tools/measure_conv_ab_r5.sh [outfile]
set -u
OUT=${1:-/tmp/conv_ab_r5.log}
cd "$(dirname "$0")/.."
: > "$OUT"
run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 1800 env "$@" 2>&1 | grep -v "xla_bridge" | tail -3 | tee -a "$OUT"
  echo | tee -a "$OUT"
}
run python bench.py uni3detr_sunrgbd            # default: unpacked-when-fits
run UNI3DETR_WALK_GROUP=9 python bench.py uni3detr_sunrgbd
run UNI3DETR_WALK_GROUP=3 python bench.py uni3detr_sunrgbd
run python bench.py uni3detr_kitti_car
run python bench.py uni3detr_nuscenes
echo DONE | tee -a "$OUT"
