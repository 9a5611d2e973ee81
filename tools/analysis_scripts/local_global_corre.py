"""Local/global score correlation scatter (port of reference
tools/analysis_scripts/local_global_corre.py).

The reference variant dumped [local_global_mean, local_global_std,
oracle_iou] rows; this port reads any two score columns + oracle column.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
from tools.analysis_scripts.common import (load_stacked, pos_neg_scatter,
                                           savefig, plt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scalars", default="scalars_all.pkl")
    ap.add_argument("--out_dir", default="./results_analysis/figures")
    ap.add_argument("--iou_thr", type=float, default=0.5)
    ap.add_argument("--cols", type=int, nargs=3, default=(0, 1, 2),
                    metavar=("MEAN", "STD", "ORACLE"))
    args = ap.parse_args()
    ca, cb, co = args.cols

    data = load_stacked(args.scalars)
    data = data[~np.isnan(data[:, co])]
    print("Data size:", len(data))
    labels = (data[:, co] > args.iou_thr).astype(float)
    pos, neg = data[labels > 0], data[labels == 0]

    plt.figure(figsize=(11, 5))
    ax = plt.subplot(1, 2, 1)
    pos_neg_scatter(ax, pos, neg, ca, co, "local-global mean",
                    "Ground-truth IoU", balance_neg=False)
    ax = plt.subplot(1, 2, 2)
    pos_neg_scatter(ax, pos, neg, cb, co, "local-global std",
                    "Ground-truth IoU", balance_neg=False)
    r = np.corrcoef(data[:, ca], data[:, cb])[0, 1]
    print(f"corr(col{ca}, col{cb}) = {r:.4f}")
    savefig(os.path.join(args.out_dir, "local_global_corre.png"))


if __name__ == "__main__":
    main()
