#!/usr/bin/env python
"""COCOeval match inspection (reference root inspect_cocoeval.py:1-167).

Extracts TP/FP/FN assignments from the evaluator's per-image match arrays at
IoU=0.5, prints a per-category confusion summary with Precision/Recall/F1,
and (reference main) compares the newest NTTT and SAM3 prediction dumps in a
work dir side by side. A cross-class confusion matrix (which wrong class
absorbed each GT — the reference stops at per-class TP/FP/FN) is available
with --cross-class."""
import argparse
import glob
import json
import os

import numpy as np

from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.cocoeval import COCOeval, bbox_iou_xywh


def get_latest_predictions(work_dir, pattern):
    """Newest `work_dir/*/pattern` by mtime (reference :14-18)."""
    files = glob.glob(os.path.join(work_dir, "*", pattern))
    if not files:
        raise FileNotFoundError(f"No files found matching {pattern} in "
                                f"{work_dir}")
    return sorted(files, key=os.path.getmtime)[-1]


def get_confusion_matrix_data(coco_eval):
    """Per-detection / per-GT match records at IoU=0.5, all areas (reference
    :20-106): TP rows for matched detections, FP rows for unmatched ones, FN
    rows for unmatched GTs."""
    p = coco_eval.params
    if p.iouThrs[0] != 0.5:
        print(f"Warning: First IoU threshold is {p.iouThrs[0]}, expected 0.5")
    iou_idx, area_idx = 0, 0
    matches = []
    for catId in p.catIds:
        for imgId in p.imgIds:
            entry = coco_eval.evalImgs.get((imgId, catId, area_idx))
            if entry is None:
                continue
            dt_ids = entry["dtIds"]
            dt_m = entry["dtMatches"][iou_idx]
            gt_ids = entry["gtIds"]
            gt_m = entry["gtMatches"][iou_idx]
            for d_idx, matched_gt_id in enumerate(dt_m):
                matches.append({
                    "image_id": imgId, "category_id": catId,
                    "type": "TP" if matched_gt_id > 0 else "FP",
                    "dt_id": dt_ids[d_idx],
                    "gt_id": matched_gt_id if matched_gt_id > 0 else None})
            for g_idx, matched_dt_id in enumerate(gt_m):
                if matched_dt_id == 0:
                    matches.append({
                        "image_id": imgId, "category_id": catId,
                        "type": "FN", "dt_id": None, "gt_id": gt_ids[g_idx]})
    return matches


def compute_confusion_matrix(coco_gt, coco_dt, name="Model", iou_type="segm"):
    """Evaluate + per-category TP/FP/FN table with Precision/Recall/F1
    (reference :108-142)."""
    print(f"Evaluating {name}...")
    coco_eval = COCOeval(coco_gt, coco_dt, iou_type)
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()

    match_data = get_confusion_matrix_data(coco_eval)
    cat_map = {c["id"]: c["name"] for c in
               coco_gt.loadCats(coco_gt.getCatIds())}
    counts = {}  # category_name -> {TP, FP, FN}
    for m in match_data:
        row = counts.setdefault(cat_map[m["category_id"]],
                                {"TP": 0, "FP": 0, "FN": 0})
        row[m["type"]] += 1

    print(f"\nConfusion Matrix for {name}:")
    print(f"{'category':>20s} {'TP':>6s} {'FP':>6s} {'FN':>6s}")
    for cname in sorted(counts):
        r = counts[cname]
        print(f"{cname:>20s} {r['TP']:>6d} {r['FP']:>6d} {r['FN']:>6d}")

    print(f"\nMetrics for {name}:")
    print(f"{'category':>20s} {'Precision':>10s} {'Recall':>10s} {'F1':>10s}")
    for cname in sorted(counts):
        r = counts[cname]
        prec = r["TP"] / (r["TP"] + r["FP"]) if r["TP"] + r["FP"] else \
            float("nan")
        rec = r["TP"] / (r["TP"] + r["FN"]) if r["TP"] + r["FN"] else \
            float("nan")
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else float("nan")
        print(f"{cname:>20s} {prec:>10.4f} {rec:>10.4f} {f1:>10.4f}")
    return match_data, counts


def cross_class_confusion(gt_json, results_json, iou_thr=0.5, score_thr=0.3):
    """[n_cats, n_cats+1] matrix: rows GT class, cols predicted class (last
    col = missed). Greedy best-IoU assignment across classes — shows WHICH
    class absorbed each GT, beyond the reference's per-class TP/FP/FN."""
    coco = COCO(gt_json)
    with open(results_json) as f:
        dets = [d for d in json.load(f) if d["score"] >= score_thr]
    cats = sorted(coco.cats.keys())
    idx = {c: i for i, c in enumerate(cats)}
    n = len(cats)
    cm = np.zeros((n, n + 1), np.int64)  # last col: missed

    dets_by_img = {}
    for d in dets:
        dets_by_img.setdefault(d["image_id"], []).append(d)

    for img_id, anns in coco.imgToAnns.items():
        img_dets = sorted(dets_by_img.get(img_id, []),
                          key=lambda d: -d["score"])
        used = [False] * len(img_dets)
        for g in anns:
            if g.get("iscrowd"):
                continue
            best, best_iou = None, iou_thr
            for j, d in enumerate(img_dets):
                if used[j]:
                    continue
                iou = bbox_iou_xywh([d["bbox"]], [g["bbox"]], [0])[0, 0]
                if iou >= best_iou:
                    best, best_iou = j, iou
            gi = idx[g["category_id"]]
            if best is None:
                cm[gi, n] += 1
            else:
                used[best] = True
                cm[gi, idx[img_dets[best]["category_id"]]] += 1
    return cm, cats


def print_cross_class(gt_json, results_json, iou_thr, score_thr):
    cm, cats = cross_class_confusion(gt_json, results_json, iou_thr,
                                     score_thr)
    coco = COCO(gt_json)
    names = [coco.cats[c]["name"] for c in cats]
    print("rows = GT class, cols = predicted class (last = missed)")
    for i, name in enumerate(names):
        total = cm[i].sum()
        if total == 0:
            continue
        hits = cm[i, i]
        print(f"{name:>20s}: correct {hits}/{total} "
              f"missed {cm[i, -1]}  top-confusions: "
              + ", ".join(f"{names[j]}={cm[i, j]}"
                          for j in np.argsort(-cm[i, :-1])[:3]
                          if j != i and cm[i, j] > 0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt-json", required=True)
    p.add_argument("--results-json",
                   help="single prediction json to inspect")
    p.add_argument("--work-dir",
                   help="compare newest */nttt_predictions.json and "
                        "*/sam3_predictions.json below this dir "
                        "(reference main, :144-162)")
    p.add_argument("--iou-type", default="segm", choices=["bbox", "segm"])
    p.add_argument("--cross-class", action="store_true",
                   help="also print the cross-class confusion matrix")
    p.add_argument("--iou-thr", type=float, default=0.5)
    p.add_argument("--score-thr", type=float, default=0.3)
    a = p.parse_args()

    coco_gt = COCO(a.gt_json)
    targets = []
    if a.work_dir:
        for tag, pattern in (("NTTT", "nttt_predictions.json"),
                             ("SAM3", "sam3_predictions.json")):
            try:
                targets.append((tag, get_latest_predictions(a.work_dir,
                                                            pattern)))
            except FileNotFoundError as e:
                print(e)
    if a.results_json:
        targets.append(("Model", a.results_json))
    if not targets:
        p.error("give --results-json and/or --work-dir")

    for tag, path in targets:
        print(f"Loading {tag} from {path}")
        coco_dt = coco_gt.loadRes(path)
        compute_confusion_matrix(coco_gt, coco_dt,
                                 f"{tag}_{a.iou_type.capitalize()}",
                                 iou_type=a.iou_type)
        if a.cross_class:
            print_cross_class(a.gt_json, path, a.iou_thr, a.score_thr)


if __name__ == "__main__":
    main()
