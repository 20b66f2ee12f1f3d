#!/bin/bash
# A/B the round-4 walk experiments on the TPU, one job at a time:
#   - positional-kernel offset grouping (UNI3DETR_WALK_GROUP=1 vs 9)
#   - counting vs accept-block matcher (UNI3DETR_MATCH_COUNT=0 vs 1)
# at the SUN RGB-D stage-1 shape (V=40k) and the nuScenes stage-1
# shape (V=120k), both C=16. Usage: bash tools/measure_walk_ab.sh [out]
set -u
OUT=${1:-/tmp/walk_ab.log}
cd "$(dirname "$0")/.."
: > "$OUT"
run() {
  echo "=== $* ===" | tee -a "$OUT"
  timeout 2400 env "$@" 2>&1 | grep -v WARNING | tee -a "$OUT"
  echo | tee -a "$OUT"
}
for V in 40000 120000; do
  run UNI3DETR_WALK_GROUP=1 UNI3DETR_MATCH_COUNT=0 \
      python tools/profile_idmatch_stage1.py $V 16
  run UNI3DETR_WALK_GROUP=9 UNI3DETR_MATCH_COUNT=1 \
      python tools/profile_idmatch_stage1.py $V 16
  run UNI3DETR_WALK_GROUP=3 UNI3DETR_MATCH_COUNT=1 \
      python tools/profile_idmatch_stage1.py $V 16
done
echo DONE | tee -a "$OUT"
