#!/usr/bin/env bash
# COCO few-shot headline pipeline (reference few_shot_full_pipeline.sh):
# sample per-class references -> fill_memory -> postprocess_memory -> test.
# Same four stages and CLI surface; TPU device count via --trainer.devices.
set -e

CONFIG=${CONFIG:-./configs/coco_fewshot_10shot_Sam2L.yaml}
CLASS_SPLIT=${CLASS_SPLIT:-few_shot_classes}
RESULTS_DIR=${RESULTS_DIR:-work_dirs/few_shot_results}
SHOTS=${SHOTS:-30}
SEED=${SEED:-33}
DEVICES=${DEVICES:-1}

mkdir -p $RESULTS_DIR
FILENAME=few_shot_${SHOTS}shot_seed${SEED}.pkl

python -m no_time_to_train_tpu.data.few_shot_sampling \
    --n-shot $SHOTS \
    --out-path ${RESULTS_DIR}/${FILENAME} \
    --seed $SEED \
    --dataset $CLASS_SPLIT

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
    --trainer.logger.save_dir ${RESULTS_DIR}/ \
    --trainer.devices $DEVICES
