"""PCA-score vs similarity vs oracle-IoU panel (port of reference
tools/analysis_scripts/pcaScore_oracleIoU.py).

The reference variant dumped [pca_score, similarity, oracle_iou] rows into
scalars_all.pkl from a PCA-scoring experiment; this port reads any dump with
two score columns + an oracle column (select with --cols).
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
                    metavar=("PCA", "SIM", "ORACLE"))
    ap.add_argument("--xname", default="PCA Score")
    ap.add_argument("--yname", default="Similarity")
    args = ap.parse_args()
    ca, cb, co = args.cols

    data = load_stacked(args.scalars)
    data = data[~np.isnan(data[:, co])]
    print("Data size:", len(data))
    labels = (data[:, co] > args.iou_thr).astype(float)
    pos, neg = data[labels > 0], data[labels == 0]
    rng = np.random.default_rng(0)
    if len(neg) > 2 * len(pos):
        neg = neg[rng.permutation(len(neg))[:2 * len(pos)]]

    plt.figure(figsize=(11, 11))
    ax = plt.subplot(2, 2, 1)
    pos_neg_scatter(ax, pos, neg, ca, co, args.xname, "Ground-truth IoU",
                    balance_neg=False)
    ax = plt.subplot(2, 2, 2)
    pos_neg_scatter(ax, pos, neg, ca, cb, args.xname, args.yname,
                    balance_neg=False)
    ax = plt.subplot(2, 2, 3)
    pos_neg_scatter(ax, pos, neg, cb, co, args.yname, "Ground-truth IoU",
                    balance_neg=False)
    ax = plt.subplot(2, 2, 4)
    prod = data[:, ca].clip(0) * data[:, cb].clip(0)
    ax.scatter(prod[labels == 0], data[labels == 0, co],
               label="negative", s=2)
    ax.scatter(prod[labels > 0], data[labels > 0, co],
               label="positive", s=2)
    ax.grid(True)
    ax.legend()
    ax.set_xlabel(f"{args.xname} x {args.yname}")
    ax.set_ylabel("Ground-truth IoU")
    savefig(os.path.join(args.out_dir, "pcaScore_oracleIoU.png"))


if __name__ == "__main__":
    main()
