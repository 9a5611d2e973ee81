#!/usr/bin/env python
"""Analyze olive-disease detection results across models / shot counts.

Port of the reference notebook `notebooks/visualization.ipynb` (13 cells):
1. load GT, 2. evaluate every results json under a work_dirs tree with
COCOeval (bbox + segm), 3. tabulate AP per (model, shots), 4. plot the
performance trend across shot counts per model, 5. render qualitative
prediction-vs-GT panels for the best run.

Run-dir naming follows the reference convention parsed by parse_filename():
work_dirs/<root>/<model>_<shots>shot*/results.json (e.g. dinov2_10shot).

    python examples/olive_results_analysis.py \
        --work-dirs work_dirs/olive_ablation \
        --gt data/olive_diseases/annotations/instances_val2017.json \
        --img-dir data/olive_diseases/val2017 --out-dir work_dirs/olive_report
"""
import argparse

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import glob
import json
import os
import re
from pathlib import Path

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.patches as patches

from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.cocoeval import COCOeval


def parse_filename(path):
    """work_dirs/.../dinov3_10shot_xyz/results.json -> (model, shots).
    Mirrors the notebook's regex over run-dir names."""
    run = os.path.basename(os.path.dirname(path))
    m = re.search(r"([A-Za-z0-9.+-]+?)_(\d+)shot", run)
    if m:
        return m.group(1), int(m.group(2))
    return run, 0


def evaluate(coco_gt, results_json, iou_type):
    with open(results_json) as f:
        dets = json.load(f)
    if not dets:
        return None
    if iou_type == "segm" and not any("segmentation" in d for d in dets):
        return None
    res = coco_gt.loadRes(dets)
    ev = COCOeval(coco_gt, res, iou_type)
    ev.evaluate(); ev.accumulate()
    stats = ev.summarize()
    return dict(AP=float(stats[0]), AP50=float(stats[1]),
                AP75=float(stats[2]), APs=float(stats[3]),
                APm=float(stats[4]), APl=float(stats[5]))


def plot_trend(rows, metric, out_path):
    models = sorted({r["model"] for r in rows})
    fig, ax = plt.subplots(figsize=(9, 5))
    for m in models:
        pts = sorted([(r["shots"], r[metric]) for r in rows
                      if r["model"] == m and r.get(metric) is not None])
        if pts:
            ax.plot([p[0] for p in pts], [p[1] for p in pts],
                    marker="o", label=m)
    ax.set_xlabel("shots"); ax.set_ylabel(metric)
    ax.set_title(f"{metric} vs shot count"); ax.legend(); ax.grid(True)
    fig.tight_layout(); fig.savefig(out_path, dpi=140); plt.close(fig)


def qualitative_panels(coco_gt, results_json, img_dir, out_dir, n=4,
                       score_thr=0.3, seed=0):
    from no_time_to_train_tpu.data import rle as rle_mod
    with open(results_json) as f:
        dets = json.load(f)
    by_img = {}
    for d in dets:
        if d.get("score", 0) >= score_thr:
            by_img.setdefault(d["image_id"], []).append(d)
    rng = np.random.default_rng(seed)
    picks = rng.permutation(sorted(by_img))[:n]
    cats = {c["id"]: c["name"] for c in coco_gt.loadCats(coco_gt.getCatIds())}
    for iid in picks:
        im = coco_gt.loadImgs([int(iid)])[0]
        gts = coco_gt.loadAnns(coco_gt.getAnnIds(imgIds=[int(iid)]))
        fig, axes = plt.subplots(1, 2, figsize=(14, 7))
        f = Path(img_dir) / im.get("file_name", "")
        if f.exists():
            from PIL import Image
            bg = np.asarray(Image.open(f).convert("RGB"))
        else:
            bg = np.zeros((im["height"], im["width"], 3), np.uint8)
        for ax, anns, title, color in ((axes[0], gts, "ground truth", "lime"),
                                       (axes[1], by_img[iid],
                                        "predictions", "red")):
            ax.imshow(bg)
            for a in anns:
                x, y, w, h = a["bbox"]
                ax.add_patch(patches.Rectangle((x, y), w, h, fill=False,
                                               edgecolor=color, linewidth=2))
                lbl = cats.get(a["category_id"], "?")
                if "score" in a:
                    lbl += f" {a['score']:.2f}"
                ax.text(x, max(y - 3, 0), lbl, color=color, fontsize=8)
                seg = a.get("segmentation")
                if isinstance(seg, dict) and "counts" in seg:
                    m = rle_mod.decode_rle(seg).astype(float)
                    ov = np.zeros(m.shape + (4,))
                    ov[m > 0] = (1, 0, 0, 0.3) if color == "red" \
                        else (0, 1, 0, 0.3)
                    ax.imshow(ov)
            ax.set_title(f"{title} — image {iid}"); ax.axis("off")
        fig.tight_layout()
        out = Path(out_dir) / f"qual_{iid}.png"
        fig.savefig(out, dpi=120); plt.close(fig)
        print(f"wrote {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work-dirs", default="work_dirs/olive_ablation")
    p.add_argument("--gt", required=True)
    p.add_argument("--img-dir", default=None)
    p.add_argument("--out-dir", default="work_dirs/olive_report")
    p.add_argument("--qualitative-n", type=int, default=4)
    a = p.parse_args()
    out_dir = Path(a.out_dir); out_dir.mkdir(parents=True, exist_ok=True)

    coco_gt = COCO(a.gt)
    rows = []
    for rj in sorted(glob.glob(os.path.join(a.work_dirs, "**",
                                            "results.json"),
                               recursive=True)):
        model, shots = parse_filename(rj)
        row = dict(model=model, shots=shots, path=rj)
        for iou_type in ("bbox", "segm"):
            st = evaluate(coco_gt, rj, iou_type)
            if st:
                row[f"{iou_type}_AP"] = st["AP"]
                row[f"{iou_type}_AP50"] = st["AP50"]
        rows.append(row)
        print(f"{model:>16s} {shots:>3d}-shot  "
              f"bbox AP {row.get('bbox_AP', float('nan')):.3f}  "
              f"segm AP {row.get('segm_AP', float('nan')):.3f}")
    if not rows:
        raise SystemExit(f"no results.json under {a.work_dirs}")

    with open(out_dir / "results_table.csv", "w") as f:
        keys = ["model", "shots", "bbox_AP", "bbox_AP50", "segm_AP",
                "segm_AP50", "path"]
        f.write(",".join(keys) + "\n")
        for r in sorted(rows, key=lambda r: (r["model"], r["shots"])):
            f.write(",".join(str(r.get(k, "")) for k in keys) + "\n")
    for metric in ("bbox_AP", "bbox_AP50", "segm_AP"):
        if any(r.get(metric) is not None for r in rows):
            plot_trend(rows, metric, out_dir / f"trend_{metric}.png")

    if a.img_dir:
        best = max((r for r in rows if r.get("bbox_AP") is not None),
                   key=lambda r: r["bbox_AP"], default=None)
        if best:
            print(f"qualitative panels from best run: {best['path']}")
            qualitative_panels(coco_gt, best["path"], a.img_dir, out_dir,
                               n=a.qualitative_n)
    print(f"report written to {out_dir}/")


if __name__ == "__main__":
    main()
