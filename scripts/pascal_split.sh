#!/usr/bin/env bash
# PASCAL-VOC few-shot: 3 splits x shots(1,2,3,5,10), 5 unseen classes each
# (reference scripts/pascal_split.sh + launch_pascal_split.sh).
set -e
SPLIT=${1:-1}
CONFIG=${CONFIG:-./pl_configs/matching_voc_template.yaml}
for SHOTS in 1 2 3 5 10; do
  OUT=work_dirs/voc/split${SPLIT}_${SHOTS}shot
  mkdir -p $OUT
  python -m no_time_to_train_tpu.data.few_shot_sampling \
      --n-shot $SHOTS --out-path $OUT/memory.pkl \
      --dataset pascal_voc_split_${SPLIT}
  python run_lightning.py test --config $CONFIG \
      --model.test_mode fill_memory --out_path $OUT/memory.ckpt \
      --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
      --model.init_args.dataset_cfgs.fill_memory.root ./data/pascal_voc/images \
      --model.init_args.dataset_cfgs.fill_memory.json_file ./data/pascal_voc/annotations/voc0712_trainval_with_segm.json \
      --model.init_args.dataset_cfgs.fill_memory.memory_pkl $OUT/memory.pkl \
      --model.init_args.dataset_cfgs.fill_memory.memory_length $SHOTS \
      --model.init_args.dataset_cfgs.fill_memory.class_split pascal_voc_split_${SPLIT}
  python run_lightning.py test --config $CONFIG \
      --model.test_mode postprocess_memory \
      --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
      --ckpt_path $OUT/memory.ckpt --out_path $OUT/memory_post.ckpt
  python run_lightning.py test --config $CONFIG \
      --model.test_mode test --ckpt_path $OUT/memory_post.ckpt \
      --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
      --model.init_args.dataset_cfgs.test.root ./data/pascal_voc/images \
      --model.init_args.dataset_cfgs.test.json_file ./data/pascal_voc/annotations/voc07_test_with_segm.json \
      --model.init_args.dataset_cfgs.test.class_split pascal_voc_split_${SPLIT} \
      --n_shot $SHOTS --seed 42
done
