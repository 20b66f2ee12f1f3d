#!/usr/bin/env bash
# Multi-process eval launcher, CLI-parity with the reference
# extra_tools/dist_test.sh ("dist_test.sh CFG CKPT NGPUS --eval=bbox").
# Per-process round-robin eval shards + file-based result gather
# (train/evaluator.py::run_inference_distributed).
#
#   tools/dist_test.sh CONFIG CHECKPOINT NPROCS [extra cli args...]
set -e
CONFIG=$1
CKPT=$2
NPROCS=$3
shift 3 || true
PORT=${PORT:-29401}
pids=()
for ((i = 0; i < NPROCS; i++)); do
  python -m uni3detr_tpu.cli.test "$CONFIG" "$CKPT" \
    --coordinator "localhost:${PORT}" \
    --num-processes "$NPROCS" --process-id "$i" "$@" &
  pids+=($!)
done
status=0
for pid in "${pids[@]}"; do
  wait "$pid" || status=$?
done
exit $status
