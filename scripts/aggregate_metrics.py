#!/usr/bin/env python
"""Aggregate run-dir metrics into a CSV (reference
scripts/aggregate_nttt_sam3_metrics.py: regex over run dirs -> COCOeval AP
table + FPS -> CSV).

Scans work_dirs/**/results.json, re-evaluates against a GT json, and collects
per-run AP / AP50 / AP75 (bbox + segm) plus FPS recorded in run logs.
"""
import argparse
import csv
import glob
import json
import os
import re


def evaluate_run(results_json, gt_json, img_limit=None):
    from no_time_to_train_tpu.data.coco_api import COCO
    from no_time_to_train_tpu.data.cocoeval import COCOeval
    coco = COCO(gt_json)
    with open(results_json) as f:
        results = json.load(f)
    if not results:
        return None
    res = coco.loadRes(results)
    out = {}
    for iou_type in ("bbox", "segm"):
        ev = COCOeval(coco, res, iou_type)
        if img_limit:
            ev.params.imgIds = sorted(coco.imgs.keys())[:img_limit]
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        out[f"{iou_type}_AP"] = float(stats[0])
        out[f"{iou_type}_AP50"] = float(stats[1])
        out[f"{iou_type}_AP75"] = float(stats[2])
    return out


def parse_fps(log_path):
    if not os.path.exists(log_path):
        return None
    txt = open(log_path).read()
    m = re.search(r"FPS:\s*([0-9.]+)", txt)
    return float(m.group(1)) if m else None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs-glob", default="work_dirs/**/results.json")
    p.add_argument("--gt-json", required=True)
    p.add_argument("--out-csv", default="work_dirs/metrics.csv")
    a = p.parse_args()

    rows = []
    for rj in sorted(glob.glob(a.runs_glob, recursive=True)):
        run_dir = os.path.dirname(rj)
        metrics = evaluate_run(rj, a.gt_json)
        if metrics is None:
            continue
        metrics["run"] = run_dir
        metrics["fps"] = parse_fps(os.path.join(run_dir, "run.log"))
        m = re.search(r"(\d+)shot", run_dir)
        metrics["shots"] = int(m.group(1)) if m else None
        m = re.search(r"seed(\d+)|_(\d+)seed", run_dir)
        metrics["seed"] = int(next(g for g in m.groups() if g)) if m else None
        rows.append(metrics)

    if rows:
        keys = ["run", "shots", "seed", "bbox_AP", "bbox_AP50", "bbox_AP75",
                "segm_AP", "segm_AP50", "segm_AP75", "fps"]
        with open(a.out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            for r in rows:
                w.writerow({k: r.get(k) for k in keys})
        print(f"wrote {len(rows)} rows to {a.out_csv}")
    else:
        print("no runs found")


if __name__ == "__main__":
    main()
