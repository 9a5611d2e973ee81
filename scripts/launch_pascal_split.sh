#!/usr/bin/env bash
# All three VOC splits (reference scripts/launch_pascal_split.sh).
set -e
for SPLIT in 1 2 3; do
  bash scripts/pascal_split.sh $SPLIT
done
