#!/usr/bin/env bash
# WeDetect-Ref SFT stage 2 — the TPU twin of the reference's
# wedetect_ref/scripts/run_stage2.sh (torchrun + deepspeed). On a TPU
# pod run this same command on every host; single host needs no env.
# Stage default LR 1e-5 + the stage's freeze schedule come from
# train/ref_lm.stage_optimizer.
#   DATA=<chat json> CKPT=<hf checkpoint dir> \
#   OUT=output/stage2 scripts/run_stage2.sh [extra flags]
set -euo pipefail
DATA=${DATA:?set DATA=<path to stage-2 data json>}
CKPT=${CKPT:-}
OUT=${OUT:-output/stage2}

mkdir -p "$OUT"
export WEDETECT_DIST=${WEDETECT_DIST:-1}
exec python -m wedetect_tpu.cli.train_ref \
    --stage 2 --data "$DATA" \
    ${CKPT:+--ref_checkpoint "$CKPT"} \
    --ckpt-dir "$OUT" \
    "$@" 2>&1 | tee -a "$OUT/stage2_log.txt"
