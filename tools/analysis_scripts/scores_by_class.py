"""Per-class similarity-vs-oracle-IoU scatter with the memory bank's mean
instance similarity as a reference line (port of reference
tools/analysis_scripts/scores_by_class.py).

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scalars", default="scalars_all.pkl")
    ap.add_argument("--out_dir", default="./results_analysis/figures")
    ap.add_argument("--iou_thr", type=float, default=0.5)
    ap.add_argument("--classes", nargs="*", default=None,
                    help="class names (defaults to the 80 COCO classes)")
    args = ap.parse_args()
    classes = args.classes or COCO_CLASSES

    scores_all = load_stacked(args.scalars)
    scores_all = scores_all[~np.isnan(scores_all[:, 2])]
    categories = scores_all[:, 1].astype(int)
    iou_oracle = scores_all[:, 2]
    mem_ins_sim = scores_all[:, 3]

    min_pos_scores, mem_ins_sims = [], []
    for i in range(int(categories.max()) + 1 if len(categories) else 0):
        cls = scores_all[categories == i]
        iou_cls = iou_oracle[categories == i]
        if cls.shape[0] == 0:
            continue
        mem_sim_cls = mem_ins_sim[categories == i][0]
        labels = (iou_cls > args.iou_thr).astype(float)
        pos, neg = cls[labels > 0], cls[labels == 0]
        name = classes[i] if i < len(classes) else str(i)
        if len(pos) > 0:
            print(f"{name}:", pos[:, 0].min(), mem_sim_cls)
            min_pos_scores.append(pos[:, 0].min())
            mem_ins_sims.append(mem_sim_cls)

        plt.scatter(neg[:, 0], neg[:, 2], label="negative", s=5)
        plt.scatter(pos[:, 0], pos[:, 2], label="positive", s=5)
        plt.plot([mem_sim_cls, mem_sim_cls], [-0.1, 1.0], color="grey")
        plt.grid(True)
        plt.legend()
        plt.xlim(0.0, 1.0)
        plt.ylim(-0.1, 1.0)
        plt.xlabel("Global Similarity")
        plt.ylabel("Ground-truth IoU")
        plt.title(name)
        savefig(os.path.join(args.out_dir, f"avgSim_{i}_{name}.png"))

    if min_pos_scores:
        plt.scatter(min_pos_scores, mem_ins_sims, s=5)
        plt.plot([0, 1], [0, 1], color="grey")
        savefig(os.path.join(args.out_dir, "minPosScore_memInsSims.png"))


if __name__ == "__main__":
    main()
