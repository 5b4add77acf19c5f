#!/usr/bin/env bash
# WeDetect-Ref SFT stage 1 — the TPU twin of the reference's
# wedetect_ref/scripts/run_stage1.sh (torchrun + deepspeed). On a TPU
# pod run this same command on every host; single host needs no env.
# Stage default LR 1e-3 + the stage's freeze schedule come from
# train/ref_lm.stage_optimizer.
#   DATA=<chat json> CKPT=<hf checkpoint dir> \
#   OUT=output/stage1 scripts/run_stage1.sh [extra flags]
set -euo pipefail
DATA=${DATA:?set DATA=<path to stage-1 data json>}
CKPT=${CKPT:-}
OUT=${OUT:-output/stage1}

mkdir -p "$OUT"
export WEDETECT_DIST=${WEDETECT_DIST:-1}
exec python -m wedetect_tpu.cli.train_ref \
    --stage 1 --data "$DATA" \
    ${CKPT:+--ref_checkpoint "$CKPT"} \
    --ckpt-dir "$OUT" \
    "$@" 2>&1 | tee -a "$OUT/stage1_log.txt"
