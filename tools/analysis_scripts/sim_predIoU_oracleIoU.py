"""DINO-similarity vs predicted-IoU vs oracle-IoU correlation (port of
reference tools/analysis_scripts/sim_predIoU_oracleIoU.py).

Reads triplets_all.pkl (runner test-mode dump, rows [sim, pred_iou,
oracle_iou]), renders the positive/negative scatter, and sweeps
classification thresholds over similarity, predicted IoU, and the blended
score sim^a * predIoU^(1-a).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
from tools.analysis_scripts.common import (load_stacked, threshold_sweep,
                                           pos_neg_scatter, savefig, plt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--triplets", default="triplets_all.pkl")
    ap.add_argument("--out_dir", default="./results_analysis/figures")
    ap.add_argument("--iou_thr", type=float, default=0.5)
    args = ap.parse_args()

    triplets = load_stacked(args.triplets)
    triplets = triplets[~np.isnan(triplets[:, 2])]
    print("Data size:", len(triplets))
    sims, pred_ious, oracle = triplets.T[:3]
    labels = (oracle > args.iou_thr).astype(float)

    pos = triplets[labels > 0]
    neg = triplets[labels == 0]
    fig, ax = plt.subplots()
    pos_neg_scatter(ax, pos, neg, 0, 1, "DINO v2 similarity",
                    "Predicted IoU")
    savefig(os.path.join(args.out_dir, "sam2_matching_analysis.png"))

    threshold_sweep(sims, labels, name="Similarity")
    threshold_sweep(pred_ious, labels, lo=0.0, hi=1.0, name="IoU")

    print("Designed metric")
    for a in np.linspace(0.0, 1.0, 11):
        scores = sims.clip(0) ** a * pred_ious.clip(0) ** (1 - a)
        print("Alpha: %.4f" % a)
        threshold_sweep(scores, labels, name=f"blend a={a:.1f}")


if __name__ == "__main__":
    main()
