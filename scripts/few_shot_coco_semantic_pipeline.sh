#!/usr/bin/env bash
# COCO semantic splits (4 x 20 classes): instance pipeline + inst->segm mIoU
# (reference scripts/few_shot_coco_semantic_pipeline.sh + coco_inst_to_segm.py).
set -e
SPLIT=${1:-1}
SHOTS=${2:-10}
SEED=${3:-42}
CLASS_SPLIT=coco_semantic_split_${SPLIT}
OUT=work_dirs/coco_semantic/split${SPLIT}_${SHOTS}shot_seed${SEED}
mkdir -p $OUT
CONFIG=${CONFIG:-./configs/coco_fewshot_10shot_Sam2L.yaml}

python -m no_time_to_train_tpu.data.few_shot_sampling \
    --n-shot $SHOTS --out-path $OUT/memory.pkl --seed $SEED --dataset $CLASS_SPLIT
python run_lightning.py test --config $CONFIG \
    --model.test_mode fill_memory --out_path $OUT/memory.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.dataset_cfgs.fill_memory.memory_pkl $OUT/memory.pkl \
    --model.init_args.dataset_cfgs.fill_memory.memory_length $SHOTS \
    --model.init_args.dataset_cfgs.fill_memory.class_split $CLASS_SPLIT
python run_lightning.py test --config $CONFIG \
    --model.test_mode postprocess_memory \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --ckpt_path $OUT/memory.ckpt --out_path $OUT/memory_post.ckpt
python run_lightning.py test --config $CONFIG \
    --model.test_mode test --ckpt_path $OUT/memory_post.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.dataset_cfgs.test.class_split $CLASS_SPLIT \
    --export_result $OUT/results.json \
    --coco_semantic_split $SPLIT --n_shot $SHOTS --seed $SEED

python - <<PY
from no_time_to_train_tpu.data.converters import coco_inst_to_segm_eval
out = coco_inst_to_segm_eval("./data/coco/annotations/instances_val2017.json",
                             "$OUT/results.json", class_split="$CLASS_SPLIT")
print("mIoU:", out["miou"])
PY
