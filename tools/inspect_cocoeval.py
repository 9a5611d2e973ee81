#!/usr/bin/env python
"""Confusion-matrix extraction from a COCO evaluation (reference root
inspect_cocoeval.py): for each GT instance, which predicted category matched
it (or miss), at a chosen IoU threshold."""
import argparse
import json

import numpy as np

from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.cocoeval import bbox_iou_xywh


def confusion_matrix(gt_json, results_json, iou_thr=0.5, score_thr=0.3):
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt-json", required=True)
    p.add_argument("--results-json", required=True)
    p.add_argument("--iou-thr", type=float, default=0.5)
    p.add_argument("--score-thr", type=float, default=0.3)
    a = p.parse_args()
    cm, cats = confusion_matrix(a.gt_json, a.results_json, a.iou_thr,
                                a.score_thr)
    coco = COCO(a.gt_json)
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


if __name__ == "__main__":
    main()
