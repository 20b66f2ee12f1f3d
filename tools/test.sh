#!/usr/bin/env bash
# Equivalent of the reference extra_tools/dist_test.sh.
#   tools/test.sh CONFIG CHECKPOINT [extra args...]
set -e
CONFIG=$1; CKPT=$2; shift 2 || true
python -m uni3detr_tpu.cli.test "$CONFIG" "$CKPT" "$@"
