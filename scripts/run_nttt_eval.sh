#!/usr/bin/env bash
# NTTT-side olive evaluation into aggregation run dirs (reference scripts/
# run_nttt_eval.sh:1-196). Per (encoder version, shots): sample -> fill ->
# postprocess -> test, exporting nttt_predictions.json + nttt_runtime.json.
# The reference's nvidia-smi poller becomes the jax allocator-stats poller
# (no_time_to_train_tpu/utils/memory_poller.py).
set -euo pipefail

CONFIG_FILE=${CONFIG_FILE:-scripts/config/olive_eval.conf}
if [[ -f "${CONFIG_FILE}" ]]; then
    source "${CONFIG_FILE}"
fi

SEED=${SEED:-42}
DEVICES=${DEVICES:-1}
OUTPUT_ROOT=${OUTPUT_ROOT:-work_dirs/olive_nttt_sam3_eval}
CONFIG=${CONFIG:-./configs/olive_fewshot_Sam2L.yaml}
CLASS_SPLIT=${CLASS_SPLIT:-olive_diseases}
TRAIN_JSON=${TRAIN_JSON:-data/olive_diseases/annotations/instances_train2017.json}
VAL_JSON=${VAL_JSON:-data/olive_diseases/annotations/instances_val2017.json}

NUM_VAL_IMAGES=$(python - <<PY
import json
with open("${VAL_JSON}") as f:
    print(len(json.load(f).get("images", [])))
PY
)
echo "Validation images for FPS computation: ${NUM_VAL_IMAGES}"

if [[ -n "${SHOTS_CSV:-}" ]]; then
    IFS=',' read -r -a SHOTS_LIST <<< "${SHOTS_CSV}"
else
    SHOTS_LIST=(1 2 3 5 10)
fi
if [[ -n "${VERSIONS_CSV:-}" ]]; then
    IFS=',' read -r -a VERSIONS <<< "${VERSIONS_CSV}"
else
    VERSIONS=("dinov2_large")
fi

for VERSION in "${VERSIONS[@]}"; do
for SHOTS in "${SHOTS_LIST[@]}"; do
    RUN_DIR=${OUTPUT_ROOT}/${VERSION}_${SHOTS}shot_seed${SEED}
    mkdir -p "${RUN_DIR}"
    FEWSHOT_PKL=olive_${SHOTS}shot_seed${SEED}.pkl
    NTTT_PRED_JSON=${RUN_DIR}/nttt_predictions.json

    echo "========================================================"
    echo "Running NTTT evaluation"
    echo "Shots: ${SHOTS} | Seed: ${SEED} | Encoder: ${VERSION}"
    echo "Output dir: ${RUN_DIR}"
    echo "========================================================"

    echo "[1/4] Sampling few-shot support set..."
    python -m no_time_to_train_tpu.data.few_shot_sampling \
        --n-shot "${SHOTS}" \
        --out-path "${RUN_DIR}/${FEWSHOT_PKL}" \
        --seed "${SEED}" \
        --dataset "${CLASS_SPLIT}" \
        --dataset-json "${TRAIN_JSON}"

    echo "[2/4] Filling NTTT memory bank..."
    python run_lightning.py test --config "${CONFIG}" \
        --model.test_mode fill_memory \
        --out_path "${RUN_DIR}/memory.ckpt" \
        --model.init_args.model_cfg.encoder_cfg "${VERSION}" \
        --model.init_args.model_cfg.memory_bank_cfg.length "${SHOTS}" \
        --model.init_args.dataset_cfgs.fill_memory.memory_pkl "${RUN_DIR}/${FEWSHOT_PKL}" \
        --model.init_args.dataset_cfgs.fill_memory.memory_length "${SHOTS}" \
        --model.init_args.dataset_cfgs.fill_memory.class_split "${CLASS_SPLIT}" \
        --trainer.devices "${DEVICES}"

    echo "[3/4] Post-processing NTTT memory bank..."
    python run_lightning.py test --config "${CONFIG}" \
        --model.test_mode postprocess_memory \
        --model.init_args.model_cfg.encoder_cfg "${VERSION}" \
        --model.init_args.model_cfg.memory_bank_cfg.length "${SHOTS}" \
        --ckpt_path "${RUN_DIR}/memory.ckpt" \
        --out_path "${RUN_DIR}/memory_postprocessed.ckpt" \
        --trainer.devices 1

    echo "[4/4] Running NTTT test and exporting predictions..."
    MEM_CSV="${RUN_DIR}/.nttt_mem_samples.csv"
    python -m no_time_to_train_tpu.utils.memory_poller \
        --out "${MEM_CSV}" --interval 2 &
    POLLER_PID=$!
    trap "kill ${POLLER_PID} 2>/dev/null || true" EXIT

    TEST_START=$(python -c 'import time; print(time.perf_counter())')
    python run_lightning.py test --config "${CONFIG}" \
        --ckpt_path "${RUN_DIR}/memory_postprocessed.ckpt" \
        --model.init_args.test_mode test \
        --model.init_args.model_cfg.encoder_cfg "${VERSION}" \
        --model.init_args.model_cfg.memory_bank_cfg.length "${SHOTS}" \
        --model.init_args.dataset_cfgs.test.class_split "${CLASS_SPLIT}" \
        --trainer.devices "${DEVICES}" \
        --seed "${SEED}" \
        --n_shot "${SHOTS}" \
        --export_result "${NTTT_PRED_JSON}"
    TEST_END=$(python -c 'import time; print(time.perf_counter())')

    kill "${POLLER_PID}" 2>/dev/null || true

    python - <<PY
import csv, json, os
peak = None
try:
    rows = list(csv.DictReader(open("${MEM_CSV}")))
    vals = [int(r["bytes_in_use"]) for r in rows if r.get("bytes_in_use")]
    if vals:
        peak = max(vals) / 2**20
except Exception:
    pass
duration = max(0.0, float("${TEST_END}") - float("${TEST_START}"))
runtime = {
    "model": "nttt",
    "encoder": "${VERSION}",
    "shots": int("${SHOTS}"),
    "seed": int("${SEED}"),
    "num_images": int("${NUM_VAL_IMAGES}"),
    "test_time_sec": duration,
    "fps": (int("${NUM_VAL_IMAGES}") / duration) if duration > 0 else 0.0,
    "peak_vram_mib": peak,
}
with open("${RUN_DIR}/nttt_runtime.json", "w") as f:
    json.dump(runtime, f, indent=2)
print("NTTT FPS:", runtime["fps"])
print("NTTT peak device memory (MiB):", peak)
PY
    rm -f "${MEM_CSV}" "${RUN_DIR}"/*.ckpt || true
    echo "Done. NTTT predictions saved to: ${NTTT_PRED_JSON}"
done
done
