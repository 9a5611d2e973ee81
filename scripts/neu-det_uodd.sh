#!/usr/bin/env bash
set -e
bash scripts/matching_cdfsod_pipeline.sh neu-det 5 6
bash scripts/matching_cdfsod_pipeline.sh uodd 5 3
