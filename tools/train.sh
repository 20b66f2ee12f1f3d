#!/usr/bin/env bash
# Equivalent of the reference extra_tools/dist_train.sh: one process
# drives every local chip via GSPMD, so no per-GPU launcher is needed.
#   tools/train.sh CONFIG [extra args...]
set -e
CONFIG=$1; shift || true
python -m uni3detr_tpu.cli.train "$CONFIG" "$@"
