#!/usr/bin/env bash
# SAM3-side evaluation on the olive dataset (reference scripts/
# run_sam3_eval.sh:1-46): exports COCO predictions + runtime json per
# (shots, seed) run dir for scripts/aggregate_nttt_sam3_metrics.py.
# Backend defaults to the TPU-native sam2_video predictor; set
# BACKEND=sam3 for the HF SAM3 path (external torch, needs SAM3 weights).
set -euo pipefail

CONFIG_FILE=${CONFIG_FILE:-scripts/config/olive_eval.conf}
if [[ -f "${CONFIG_FILE}" ]]; then
    source "${CONFIG_FILE}"
fi

SEED=${SEED:-42}
BACKEND=${BACKEND:-sam2_video}
SAM3_RUN_PREFIX=${SAM3_RUN_PREFIX:-sam3}
OUTPUT_ROOT=${OUTPUT_ROOT:-work_dirs/olive_nttt_sam3_eval}
PREDICTION_NAME=${PREDICTION_NAME:-sam3_predictions.json}
SAM2_CKPT=${SAM2_CKPT:-}

if [[ -n "${SHOTS_CSV:-}" ]]; then
    IFS=',' read -r -a SHOTS_LIST <<< "${SHOTS_CSV}"
else
    SHOTS_LIST=(1 2 3 5 10)
fi

for SHOTS in "${SHOTS_LIST[@]}"; do
    RUN_DIR=${OUTPUT_ROOT}/${SAM3_RUN_PREFIX}_${SHOTS}shot_seed${SEED}
    mkdir -p "${RUN_DIR}"
    echo "========================================================"
    echo "Running ${BACKEND} evaluation"
    echo "Shots: ${SHOTS} | Seed: ${SEED}"
    echo "Output dir: ${RUN_DIR}"
    echo "========================================================"
    python scripts/eval_sam3_video_olive.py \
        --shots "${SHOTS}" \
        --seed "${SEED}" \
        --backend "${BACKEND}" \
        ${SAM2_CKPT:+--sam2_ckpt "${SAM2_CKPT}"} \
        --output_dir "${RUN_DIR}" \
        --prediction_file "${PREDICTION_NAME}" \
        --evaluate_coco
    echo "Done. Predictions saved to: ${RUN_DIR}/${PREDICTION_NAME}"
done
