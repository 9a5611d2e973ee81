#!/usr/bin/env bash
# Olive-disease pipeline (reference scripts/olive_pipeline.sh).
set -e
SHOTS=${SHOTS:-5}
CONFIG=${CONFIG:-./configs/olive_fewshot_Sam2L.yaml}
OUT=work_dirs/olive/${SHOTS}shot
mkdir -p $OUT
python -m no_time_to_train_tpu.data.few_shot_sampling \
    --n-shot $SHOTS --out-path $OUT/memory.pkl --dataset olive_diseases
python run_lightning.py test --config $CONFIG \
    --model.test_mode fill_memory --out_path $OUT/memory.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.dataset_cfgs.fill_memory.memory_pkl $OUT/memory.pkl \
    --model.init_args.dataset_cfgs.fill_memory.memory_length $SHOTS
python run_lightning.py test --config $CONFIG \
    --model.test_mode postprocess_memory \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --ckpt_path $OUT/memory.ckpt --out_path $OUT/memory_post.ckpt
python run_lightning.py test --config $CONFIG \
    --model.test_mode test --ckpt_path $OUT/memory_post.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --export_result $OUT/results.json
