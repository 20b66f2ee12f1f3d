#!/usr/bin/env bash
# Multi-process launcher, CLI-parity with the reference
# extra_tools/dist_train.sh ("dist_train.sh CFG NGPUS [args...]",
# README.md:94-102). On a TPU pod slice each host normally runs one
# process started by the cluster scheduler; this script covers the
# single-machine multi-process case (e.g. CPU device partitioning for
# tests, or one process per local chip group) over a loopback
# coordinator, mirroring torch.distributed.launch semantics.
#
#   tools/dist_train.sh CONFIG NPROCS [extra cli args...]
set -e
CONFIG=$1
NPROCS=$2
shift 2 || true
PORT=${PORT:-29400}
pids=()
for ((i = 0; i < NPROCS; i++)); do
  python -m uni3detr_tpu.cli.train "$CONFIG" \
    --coordinator "localhost:${PORT}" \
    --num-processes "$NPROCS" --process-id "$i" "$@" &
  pids+=($!)
done
status=0
for pid in "${pids[@]}"; do
  wait "$pid" || status=$?
done
exit $status
