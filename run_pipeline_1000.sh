#!/usr/bin/env bash
# Smoke pipeline on a 1000-image COCO val subset with the Sam2-S preset
# (reference run_pipeline_1000.sh). Builds the subset json if missing via
# data.converters.sample_sub_dataset, then runs the 4-stage few-shot flow.
# Checkpoints are expected under ./checkpoints (no network downloads here —
# see README "Checkpoints" for the conversion tooling).
set -e

CONFIG=${CONFIG:-./configs/coco_fewshot_10shot_Sam2S.yaml}
CLASS_SPLIT=${CLASS_SPLIT:-few_shot_classes}
RESULTS_DIR=${RESULTS_DIR:-work_dirs/few_shot_results_1000}
SHOTS=${SHOTS:-10}
SEED=${SEED:-33}
DEVICES=${DEVICES:-1}
SUBSET_JSON=${SUBSET_JSON:-./data/coco/annotations/val2017_1000.json}

mkdir -p $RESULTS_DIR
FILENAME=few_shot_${SHOTS}shot_seed${SEED}.pkl

if [ ! -f "$SUBSET_JSON" ]; then
  echo "Building 1000-image val subset..."
  python - <<PY
from no_time_to_train_tpu.data.converters import sample_sub_dataset
sample_sub_dataset("./data/coco/annotations/instances_val2017.json",
                   "$SUBSET_JSON", 1000, seed=$SEED)
PY
fi

python -m no_time_to_train_tpu.data.few_shot_sampling \
    --n-shot $SHOTS --out-path ${RESULTS_DIR}/${FILENAME} \
    --seed $SEED --dataset $CLASS_SPLIT

python run_lightning.py test --config $CONFIG \
    --model.test_mode fill_memory \
    --out_path ${RESULTS_DIR}/memory.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.dataset_cfgs.fill_memory.memory_pkl ${RESULTS_DIR}/${FILENAME} \
    --model.init_args.dataset_cfgs.fill_memory.memory_length $SHOTS \
    --model.init_args.dataset_cfgs.fill_memory.class_split $CLASS_SPLIT \
    --trainer.logger.save_dir ${RESULTS_DIR}/ \
    --trainer.devices $DEVICES

python run_lightning.py test --config $CONFIG \
    --model.test_mode postprocess_memory \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --ckpt_path ${RESULTS_DIR}/memory.ckpt \
    --out_path ${RESULTS_DIR}/memory_postprocessed.ckpt \
    --trainer.devices 1

python run_lightning.py test --config $CONFIG \
    --ckpt_path ${RESULTS_DIR}/memory_postprocessed.ckpt \
    --model.test_mode test \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.model_cfg.dataset_name $CLASS_SPLIT \
    --model.init_args.dataset_cfgs.test.class_split $CLASS_SPLIT \
    --model.init_args.dataset_cfgs.test.json_file $SUBSET_JSON \
    --trainer.logger.save_dir ${RESULTS_DIR}/ \
    --trainer.devices $DEVICES

echo "Done! Results are in $RESULTS_DIR"
