#!/usr/bin/env bash
# Smoke pipeline: SAM2-S on a 500-image COCO subset (reference
# run_pipeline_1000.sh) — the closest thing to an integration test on data.
set -e
SHOTS=${SHOTS:-1}
OUT=work_dirs/smoke
mkdir -p $OUT
python - <<PY
from no_time_to_train_tpu.data.converters import sample_sub_dataset
sample_sub_dataset("./data/coco/annotations/instances_val2017.json",
                   "$OUT/val_500.json", 500)
PY
CONFIG=./configs/coco_fewshot_10shot_Sam2S.yaml
python -m no_time_to_train_tpu.data.few_shot_sampling \
    --n-shot $SHOTS --out-path $OUT/memory.pkl --dataset few_shot_classes
python run_lightning.py test --config $CONFIG \
    --model.test_mode fill_memory --out_path $OUT/memory.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.dataset_cfgs.fill_memory.memory_pkl $OUT/memory.pkl \
    --model.init_args.dataset_cfgs.fill_memory.memory_length $SHOTS \
    --model.init_args.dataset_cfgs.fill_memory.class_split few_shot_classes
python run_lightning.py test --config $CONFIG \
    --model.test_mode postprocess_memory \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --ckpt_path $OUT/memory.ckpt --out_path $OUT/memory_post.ckpt
python run_lightning.py test --config $CONFIG \
    --model.test_mode test --ckpt_path $OUT/memory_post.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.dataset_cfgs.test.json_file $OUT/val_500.json \
    --model.init_args.dataset_cfgs.test.class_split few_shot_classes
