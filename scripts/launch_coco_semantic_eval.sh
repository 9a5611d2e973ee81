#! /bin/bash
# Batch instance->semantic evaluation over the 4 COCO semantic splits
# (reference scripts/launch_coco_semantic_eval.sh): evaluates the result
# jsons produced by few_shot_coco_semantic_pipeline.sh /
# launch_coco_semantic.sh.

SPLITS=(1 2 3 4)
SHOTS=(1 5)
SEED=99

for SPLIT in ${SPLITS[@]}; do
    for SHOT in ${SHOTS[@]}; do
        echo " ==> Evaluating split ${SPLIT} shot ${SHOT} seed ${SEED}"
        python3 scripts/coco_inst_to_segm.py \
            --pred_json inst_to_segm/coco_inst_semantic_split_${SPLIT}_${SHOT}shot_${SEED}seed_results.json \
            --class_split coco_semantic_split_${SPLIT}
    done
done
