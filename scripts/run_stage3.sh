#!/usr/bin/env bash
# WeDetect-Ref SFT stage 3 — the TPU twin of the reference's
# wedetect_ref/scripts/run_stage3.sh (torchrun + deepspeed). On a TPU
# pod run this same command on every host; single host needs no env.
# Stage default LR 1e-5 + the stage's freeze schedule come from
# train/ref_lm.stage_optimizer.
#   DATA=<referring data json> CKPT=<hf checkpoint dir> \
#   OUT=output/stage3 scripts/run_stage3.sh [extra flags]
set -euo pipefail
DATA=${DATA:?set DATA=<path to stage-3 data json>}
CKPT=${CKPT:-}
OUT=${OUT:-output/stage3}
PROPOSALS=${PROPOSALS:?set PROPOSALS=<per-image proposal json>}
mkdir -p "$OUT"
export WEDETECT_DIST=${WEDETECT_DIST:-1}
exec python -m wedetect_tpu.cli.train_ref \
    --stage 3 --data "$DATA" \
    ${CKPT:+--ref_checkpoint "$CKPT"} \
    --ckpt-dir "$OUT" --proposals "$PROPOSALS" \
    "$@" 2>&1 | tee -a "$OUT/stage3_log.txt"
