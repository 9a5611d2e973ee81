"""Aggregate NTTT/SAM3 COCO metrics and FPS across run folders into one CSV
(port of reference scripts/aggregate_nttt_sam3_metrics.py:1-187, backed by
the self-contained COCO/COCOeval in no_time_to_train_tpu.data instead of
pycocotools).

Run folders follow <version>_<shots>shot_seed<seed> and contain
{nttt,sam3}_predictions.json + {nttt,sam3}_runtime.json (keys: fps,
peak_vram_mib). Every run contributes one row per model with bbox_/segm_
AP/AR columns.
"""
import argparse
import csv
import json
import math
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.cocoeval import COCOeval

RUN_DIR_PATTERN = re.compile(
    r"^(?P<version>.+)_(?P<shots>\d+)shot_seed(?P<seed>\d+)$")

STAT_NAMES = ["AP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
              "AR@1", "AR@10", "AR@100", "AR_small", "AR_medium", "AR_large"]


def parse_args():
    p = argparse.ArgumentParser(
        description="Aggregate NTTT/SAM3 COCO metrics and FPS across run "
                    "folders into one CSV.")
    p.add_argument("--root_dir", type=str,
                   default="work_dirs/olive_nttt_sam3_eval")
    p.add_argument("--gt_json", type=str,
                   default="data/olive_diseases/annotations/"
                           "instances_val2017.json")
    p.add_argument("--out_csv", type=str,
                   default="work_dirs/olive_nttt_sam3_eval/"
                           "metrics_summary.csv")
    return p.parse_args()


def run_coco_eval(coco_gt, predictions, iou_type="segm"):
    if len(predictions) == 0:
        raise ValueError("Prediction list is empty")
    coco_dt = coco_gt.loadRes(predictions)
    ev = COCOeval(coco_gt, coco_dt, iou_type)
    ev.params.imgIds = sorted(coco_gt.getImgIds())
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    return {name: float(stats[i]) for i, name in enumerate(STAT_NAMES)}


def load_runtime_stat(runtime_path, key):
    if not runtime_path.exists():
        return math.nan
    with open(runtime_path) as f:
        value = json.load(f).get(key, math.nan)
    return float(value) if value is not None else math.nan


def collect_rows_for_model(coco_gt, run_dir, version, shots, seed,
                           model_name, pred_file, runtime_file):
    pred_path = run_dir / pred_file
    runtime_path = run_dir / runtime_file
    if not pred_path.exists():
        return None
    with open(pred_path) as f:
        predictions = json.load(f)
    row = {
        "run_dir": run_dir.name, "version": version, "shots": int(shots),
        "seed": int(seed), "model": model_name,
        "fps": load_runtime_stat(runtime_path, "fps"),
        "peak_vram_mib": load_runtime_stat(runtime_path, "peak_vram_mib"),
        "num_predictions": len(predictions),
    }
    if len(predictions) == 0:
        return row
    row.update({f"bbox_{k}": v for k, v in
                run_coco_eval(coco_gt, predictions, "bbox").items()})
    row.update({f"segm_{k}": v for k, v in
                run_coco_eval(coco_gt, predictions, "segm").items()})
    return row


def main():
    args = parse_args()
    root_dir = Path(args.root_dir)
    out_csv = Path(args.out_csv)
    gt_json = Path(args.gt_json)
    if not root_dir.exists():
        raise FileNotFoundError(f"root_dir not found: {root_dir}")
    if not gt_json.exists():
        raise FileNotFoundError(f"gt_json not found: {gt_json}")

    coco_gt = COCO(str(gt_json))
    rows = []
    for run_dir in sorted(d for d in root_dir.iterdir() if d.is_dir()):
        m = RUN_DIR_PATTERN.match(run_dir.name)
        if m is None:
            continue
        for model, pred, rt in (
                ("NTTT", "nttt_predictions.json", "nttt_runtime.json"),
                ("SAM3", "sam3_predictions.json", "sam3_runtime.json")):
            row = collect_rows_for_model(
                coco_gt, run_dir, m.group("version"), m.group("shots"),
                m.group("seed"), model, pred, rt)
            if row is not None:
                rows.append(row)

    if not rows:
        raise RuntimeError(
            "No valid runs found. Ensure run folders follow "
            "'<version>_<shots>shot_seed<seed>' and contain prediction "
            "JSON files.")

    rows.sort(key=lambda r: (r["version"], r["shots"], r["seed"], r["model"]))
    fields = []
    for r in rows:
        fields.extend(k for k in r if k not in fields)
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"Saved summary CSV: {out_csv}")
    print(f"Rows: {len(rows)}")


if __name__ == "__main__":
    main()
