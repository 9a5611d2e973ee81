#!/usr/bin/env bash
# CD-FSOD wrappers: DIOR (20 classes) and FISH (1 class), 5-shot.
set -e
bash scripts/matching_cdfsod_pipeline.sh dior 5 20
bash scripts/matching_cdfsod_pipeline.sh fish 5 1
