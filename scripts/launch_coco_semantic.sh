#!/usr/bin/env bash
# All four COCO semantic splits (reference scripts/launch_coco_semantic.sh).
set -e
SHOTS=${SHOTS:-10}
for SPLIT in 1 2 3 4; do
  bash scripts/few_shot_coco_semantic_pipeline.sh $SPLIT $SHOTS
done
