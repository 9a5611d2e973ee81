#!/usr/bin/env bash
# LVIS long-tail pipeline (reference scripts/lvis_pipeline.sh): split-aware
# category counts, minival json selection, rare-class sampling escapes.
set -e
SPLIT=${1:-lvis}          # lvis | lvis_common | lvis_frequent | lvis_rare | lvis_minival*
SHOTS=${2:-10}
CONFIG=${CONFIG:-./pl_configs/matching_lvis_template.yaml}
OUT=work_dirs/lvis/${SPLIT}_${SHOTS}shot
mkdir -p $OUT

case $SPLIT in
  lvis|lvis_minival) N_CLASSES=1203 ;;
  lvis_common|lvis_minival_common) N_CLASSES=461 ;;
  lvis_frequent|lvis_minival_frequent) N_CLASSES=405 ;;
  lvis_rare|lvis_minival_rare) N_CLASSES=337 ;;
  *) echo "unknown split $SPLIT"; exit 1 ;;
esac
case $SPLIT in
  lvis_minival*) TEST_JSON=./data/lvis/lvis_v1_minival_fixed.json ;;
  *) TEST_JSON=./data/lvis/lvis_v1_val.json ;;
esac

python -m no_time_to_train_tpu.data.few_shot_sampling \
    --n-shot $SHOTS --out-path $OUT/memory.pkl --dataset $SPLIT

for MODE_ARGS in "fill_memory --out_path $OUT/memory.ckpt" \
                 "postprocess_memory --ckpt_path $OUT/memory.ckpt --out_path $OUT/memory_post.ckpt"; do
  set -- $MODE_ARGS
  MODE=$1; shift
  python run_lightning.py test --config $CONFIG \
      --model.test_mode $MODE "$@" \
      --model.init_args.model_cfg.memory_bank_cfg.category_num $N_CLASSES \
      --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
      --model.init_args.dataset_cfgs.fill_memory.root ./data/coco/train2017 \
      --model.init_args.dataset_cfgs.fill_memory.json_file ./data/lvis/lvis_v1_train.json \
      --model.init_args.dataset_cfgs.fill_memory.memory_pkl $OUT/memory.pkl \
      --model.init_args.dataset_cfgs.fill_memory.memory_length $SHOTS \
      --model.init_args.dataset_cfgs.fill_memory.class_split $SPLIT
done

python run_lightning.py test --config $CONFIG \
    --model.test_mode test --ckpt_path $OUT/memory_post.ckpt \
    --model.init_args.model_cfg.memory_bank_cfg.category_num $N_CLASSES \
    --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
    --model.init_args.dataset_cfgs.test.root ./data/coco \
    --model.init_args.dataset_cfgs.test.json_file $TEST_JSON \
    --model.init_args.dataset_cfgs.test.class_split $SPLIT \
    --export_result $OUT/results.json

# LVIS evaluation (maxDets=300, APr/APc/APf buckets) on the exported results
python -m no_time_to_train_tpu.data.lvis_eval \
    --gt $TEST_JSON --results $OUT/results.json --iou-type segm
python -m no_time_to_train_tpu.data.lvis_eval \
    --gt $TEST_JSON --results $OUT/results.json --iou-type bbox
