#!/usr/bin/env bash
set -e
bash scripts/matching_cdfsod_pipeline.sh artaxor 5 7
bash scripts/matching_cdfsod_pipeline.sh clipart1k 5 20
