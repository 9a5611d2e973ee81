#!/usr/bin/env bash
# CD-FSOD cross-domain pipeline (ArTaxOr/clipart1k/DIOR/FISH/NEU-DET/UODD):
# box->segm pseudo-labels with SAM2, json->pkl, then the 3-phase matching run.
# Interface mirrors the reference scripts/matching_cdfsod_pipeline.sh.
set -e
DATASET=${1:?usage: matching_cdfsod_pipeline.sh <dataset> <n_shot> <n_classes>}
SHOTS=${2:-5}
N_CLASSES=${3:?n_classes required}
DATA_ROOT=${DATA_ROOT:-./data/cd_fsod}
CONFIG=${CONFIG:-./pl_configs/matching_cdfsod_template.yaml}
OUT=work_dirs/cdfsod/${DATASET}_${SHOTS}shot
mkdir -p $OUT

TRAIN_JSON=${DATA_ROOT}/${DATASET}/annotations/${SHOTS}_shot.json
TEST_JSON=${DATA_ROOT}/${DATASET}/annotations/test.json
TRAIN_IMGS=${DATA_ROOT}/${DATASET}/train
TEST_IMGS=${DATA_ROOT}/${DATASET}/test

# 1) segmentation pseudo-labels for box-only annotations (SAM2 box prompts)
python - "$TRAIN_JSON" "$TRAIN_IMGS" "$OUT/train_segm.json" <<'PY'
import sys
from no_time_to_train_tpu.data.converters import sam_bbox_to_segm_batch
from no_time_to_train_tpu.models.sam2.image_predictor import SAM2ImagePredictor
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.config.presets import SAM2_PRESETS
from no_time_to_train_tpu.utils.checkpoint import load_sam2_torch_checkpoint
cfg = SAM2_PRESETS["sam2_hiera_l.yaml"]
params = load_sam2_torch_checkpoint("./checkpoints/sam2_hiera_large.pt", cfg)
pred = SAM2ImagePredictor(SAM2(cfg), params)
sam_bbox_to_segm_batch(sys.argv[1], sys.argv[2], sys.argv[3], pred)
PY

# 2) json -> memory pkl
python - "$OUT/train_segm.json" "$OUT/memory.pkl" "$SHOTS" <<'PY'
import sys
from no_time_to_train_tpu.data.converters import coco_to_pkl
coco_to_pkl(sys.argv[1], sys.argv[2], int(sys.argv[3]))
PY

# 3) fill / postprocess / test
python run_lightning.py test --config $CONFIG \
        --model.test_mode fill_memory --out_path $OUT/memory.ckpt \
        --model.init_args.model_cfg.memory_bank_cfg.category_num $N_CLASSES \
        --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
        --model.init_args.dataset_cfgs.fill_memory.root $TRAIN_IMGS \
        --model.init_args.dataset_cfgs.fill_memory.json_file $OUT/train_segm.json \
        --model.init_args.dataset_cfgs.fill_memory.memory_pkl $OUT/memory.pkl \
        --model.init_args.dataset_cfgs.fill_memory.memory_length $SHOTS

python run_lightning.py test --config $CONFIG \
        --model.test_mode postprocess_memory \
        --model.init_args.model_cfg.memory_bank_cfg.category_num $N_CLASSES \
        --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
        --ckpt_path $OUT/memory.ckpt --out_path $OUT/memory_post.ckpt

python run_lightning.py test --config $CONFIG \
        --model.test_mode test --ckpt_path $OUT/memory_post.ckpt \
        --model.init_args.model_cfg.memory_bank_cfg.category_num $N_CLASSES \
        --model.init_args.model_cfg.memory_bank_cfg.length $SHOTS \
        --model.init_args.dataset_cfgs.test.root $TEST_IMGS \
        --model.init_args.dataset_cfgs.test.json_file $TEST_JSON \
        --export_result $OUT/results.json
