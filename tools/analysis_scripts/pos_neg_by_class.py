"""Per-class positive/negative similarity histograms (port of reference
tools/analysis_scripts/pos_neg_by_class.py).

Reads scalars_all.pkl rows [sim, category, oracle_iou, mem_ins_sim].
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
from tools.analysis_scripts.common import (COCO_CLASSES, load_stacked,
                                           savefig, plt)


def _hist(pos_scores, neg_scores, title, out_path, low_thr=0.0):
    bins = np.linspace(low_thr, 1.0, 50)
    plt.hist(pos_scores, bins=bins, label="positive", alpha=0.5)
    plt.hist(neg_scores, bins=bins, label="negative", alpha=0.5)
    plt.grid(True)
    plt.legend()
    plt.xlim(0.0, 1.0)
    plt.xlabel("Global Similarity")
    plt.ylabel("Density")
    plt.title(title)
    savefig(out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scalars", default="scalars_all.pkl")
    ap.add_argument("--out_dir", default="./results_analysis/figures")
    ap.add_argument("--iou_thr", type=float, default=0.5)
    ap.add_argument("--low_thr", type=float, default=0.0)
    ap.add_argument("--classes", nargs="*", default=None)
    args = ap.parse_args()
    classes = args.classes or COCO_CLASSES

    scores_all = load_stacked(args.scalars)
    scores_all = scores_all[~np.isnan(scores_all[:, 2])]
    sims = scores_all[:, 0]
    categories = scores_all[:, 1].astype(int)
    iou_oracle = scores_all[:, 2]

    for i in range(int(categories.max()) + 1 if len(categories) else 0):
        s_cls = sims[categories == i]
        iou_cls = iou_oracle[categories == i]
        keep = s_cls > args.low_thr
        s_cls, iou_cls = s_cls[keep], iou_cls[keep]
        if s_cls.shape[0] == 0:
            continue
        labels = (iou_cls > args.iou_thr).astype(float)
        name = classes[i] if i < len(classes) else str(i)
        _hist(s_cls[labels > 0], s_cls[labels == 0], name,
              os.path.join(args.out_dir, f"score_hist_{i}_{name}.png"),
              args.low_thr)

    keep = sims > args.low_thr
    labels = (iou_oracle[keep] > args.iou_thr).astype(float)
    _hist(sims[keep][labels > 0], sims[keep][labels == 0], "All classes",
          os.path.join(args.out_dir, "score_hist_allClasses.png"),
          args.low_thr)


if __name__ == "__main__":
    main()
