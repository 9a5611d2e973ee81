#!/usr/bin/env bash
# Seeds x shots ablation sweep (reference scripts/ablation_coco_std.sh);
# aggregate with scripts/aggregate_metrics.py.
set -e
for SHOTS in 1 10 30; do
  for SEED in 33 42 2025; do
    SHOTS=$SHOTS SEED=$SEED RESULTS_DIR=work_dirs/ablation/${SHOTS}shot_${SEED} \
      bash few_shot_full_pipeline.sh
  done
done
