"""Local vs global similarity against oracle IoU, with blended-score
threshold sweeps (port of reference
tools/analysis_scripts/local_global_oracleIoU.py).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
from tools.analysis_scripts.common import (load_stacked, pos_neg_scatter,
                                           threshold_sweep, savefig, plt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scalars", default="scalars_all.pkl")
    ap.add_argument("--out_dir", default="./results_analysis/figures")
    ap.add_argument("--iou_thr", type=float, default=0.5)
    ap.add_argument("--cols", type=int, nargs=3, default=(0, 1, 2),
                    metavar=("LOCAL", "GLOBAL", "ORACLE"))
    args = ap.parse_args()
    ca, cb, co = args.cols

    data = load_stacked(args.scalars)
    data = data[~np.isnan(data[:, co])]
    print("Data size:", len(data))
    labels = (data[:, co] > args.iou_thr).astype(float)
    pos, neg = data[labels > 0], data[labels == 0]

    plt.figure(figsize=(11, 11))
    ax = plt.subplot(2, 2, 1)
    pos_neg_scatter(ax, pos, neg, ca, co, "Local similarity",
                    "Ground-truth IoU", balance_neg=False)
    ax = plt.subplot(2, 2, 2)
    pos_neg_scatter(ax, pos, neg, cb, co, "Global similarity",
                    "Ground-truth IoU", balance_neg=False)
    ax = plt.subplot(2, 2, 3)
    pos_neg_scatter(ax, pos, neg, ca, cb, "Local similarity",
                    "Global similarity", balance_neg=False)
    savefig(os.path.join(args.out_dir, "local_global_oracleIoU.png"))

    threshold_sweep(data[:, ca], labels, name="Local similarity")
    threshold_sweep(data[:, cb], labels, name="Global similarity")
    for a in (0.25, 0.5, 0.75):
        blended = data[:, ca].clip(0) ** a * data[:, cb].clip(0) ** (1 - a)
        threshold_sweep(blended, labels, name=f"blend a={a}")


if __name__ == "__main__":
    main()
