#!/usr/bin/env bash
# Combined NTTT + SAM3 comparison launcher (reference scripts/
# run_nttt_sam3_eval.sh): runs both sides into one run-dir tree, then
# aggregates to a CSV with scripts/aggregate_nttt_sam3_metrics.py.
set -euo pipefail

SCRIPT_DIR=$(cd -- "$(dirname -- "${BASH_SOURCE[0]}")" && pwd)
CONFIG_FILE=${CONFIG_FILE:-${SCRIPT_DIR}/config/olive_eval.conf}
RUN_SAM3=${RUN_SAM3:-1}
RUN_NTTT=${RUN_NTTT:-1}
OUTPUT_ROOT=${OUTPUT_ROOT:-work_dirs/olive_nttt_sam3_eval}
GT_JSON=${GT_JSON:-data/olive_diseases/annotations/instances_val2017.json}

if [[ "${RUN_NTTT}" == "1" ]]; then
    echo ">>> NTTT side (matching pipeline)"
    CONFIG_FILE=${CONFIG_FILE} OUTPUT_ROOT=${OUTPUT_ROOT} \
        bash "${SCRIPT_DIR}/run_nttt_eval.sh"
fi

if [[ "${RUN_SAM3}" == "1" ]]; then
    echo ">>> SAM3 side (video-framed few-shot)"
    CONFIG_FILE=${CONFIG_FILE} OUTPUT_ROOT=${OUTPUT_ROOT} \
        bash "${SCRIPT_DIR}/run_sam3_eval.sh"
fi

python scripts/aggregate_nttt_sam3_metrics.py \
    --root_dir "${OUTPUT_ROOT}" \
    --gt_json "${GT_JSON}" \
    --out_csv "${OUTPUT_ROOT}/metrics_summary.csv"
