#!/usr/bin/env bash
# Multihost detector eval — the TPU twin of the reference's
# dist_test.sh (reference dist_test.sh:1-24 wraps torchrun).
#
# On a TPU pod, run THIS SAME command on every host:
#   scripts/dist_test.sh <checkpoint.pth> <ann.json> <img_root> [extra flags]
# jax.distributed discovers peers from the TPU metadata
# (eval/dist.maybe_initialize); results merge over DCN via
# process_allgather. On CPU/GPU clusters, export the JAX env triple
# per process instead:
#   JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=8 \
#   JAX_PROCESS_ID=$RANK scripts/dist_test.sh ...
set -euo pipefail
CHECKPOINT=$1
ANN=$2
IMG_ROOT=$3
export WEDETECT_DIST=${WEDETECT_DIST:-1}
exec python -m wedetect_tpu.cli.test \
    --checkpoint "$CHECKPOINT" --ann "$ANN" --img-root "$IMG_ROOT" \
    "${@:4}"
