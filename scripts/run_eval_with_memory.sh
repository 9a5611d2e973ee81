#!/usr/bin/env bash
# Evaluation wrapper with an accelerator-memory sampler (reference
# scripts/run_nttt_eval.sh:26-60 uses nvidia-smi; here the poller reads the
# device allocator stats through jax).
set -e
OUT_DIR=${OUT_DIR:-work_dirs/eval_run}
mkdir -p $OUT_DIR

python -m no_time_to_train_tpu.utils.memory_poller \
    --out $OUT_DIR/memory_samples.csv --interval 2 &
POLLER_PID=$!
trap "kill $POLLER_PID 2>/dev/null || true" EXIT

"$@" 2>&1 | tee $OUT_DIR/run.log

kill $POLLER_PID 2>/dev/null || true
python - <<PY
import csv
rows = list(csv.DictReader(open("$OUT_DIR/memory_samples.csv")))
if rows:
    peak = max(int(r["bytes_in_use"]) for r in rows if r["bytes_in_use"])
    print(f"peak device memory: {peak/1e9:.2f} GB over {len(rows)} samples")
PY
