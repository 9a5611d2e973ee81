"""Shared helpers for the offline score-analysis scripts (ports of reference
tools/analysis_scripts/*). All scripts consume the pickles the runner dumps
in test mode: scalars_all.pkl (rows [sim, category, oracle_iou,
mem_ins_sim]) and triplets_all.pkl (rows [sim, pred_iou, oracle_iou]), one
[N, C] array per image.
"""
import os
import pickle

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

plt.style.use("ggplot")

COCO_CLASSES = (
    'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
    'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
    'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep',
    'cow', 'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella',
    'handbag', 'tie', 'suitcase', 'frisbee', 'skis', 'snowboard',
    'sports ball', 'kite', 'baseball bat', 'baseball glove', 'skateboard',
    'surfboard', 'tennis racket', 'bottle', 'wine glass', 'cup', 'fork',
    'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
    'couch', 'potted plant', 'bed', 'dining table', 'toilet', 'tv',
    'laptop', 'mouse', 'remote', 'keyboard', 'cell phone', 'microwave',
    'oven', 'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
    'scissors', 'teddy bear', 'hair drier', 'toothbrush')


def load_stacked(path):
    """Load a runner score dump (list of per-image [N, C] arrays, or the
    older per-image dict format) as one [sumN, C] array."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    if data and isinstance(data[0], dict):
        rows = []
        for s in data:
            v = np.asarray(s["valid"], bool)
            rows.append(np.stack(
                [np.asarray(s["scores"])[v],
                 np.asarray(s["labels"])[v].astype(np.float64),
                 np.full(int(v.sum()), np.nan),
                 np.asarray(s["pred_ious"])[v]], axis=1))
        return np.concatenate(rows, axis=0)
    return np.concatenate([np.asarray(d) for d in data], axis=0)


def threshold_sweep(scores, labels, n=20, lo=None, hi=None, name=""):
    """Reference-style accuracy/recall/precision/F1 sweep over score
    thresholds (sim_predIoU_oracleIoU.py)."""
    lo = scores.min() if lo is None else lo
    hi = scores.max() if hi is None else hi
    n_data = float(len(scores))
    rows = []
    print(f"{name} analysis:")
    for s in np.linspace(lo, hi, n):
        pred = (scores >= s).astype(float)
        acc = (labels == pred).sum() / n_data
        recall = (labels == pred)[labels == 1].sum() / max(labels.sum(), 1)
        denom = max(pred.sum(), 1)
        precision = (labels == pred)[labels == 1].sum() / denom
        f1 = 0.0 if recall <= 0 or precision <= 0 else \
            1.0 / (1.0 / recall + 1.0 / precision)
        rows.append((s, acc, recall, precision, f1))
        print("Thr: %.4f, Acc: %.4f, Recall: %.4f, Precision: %.4f, "
              "F1: %.4f" % rows[-1])
    return rows


def pos_neg_scatter(ax, pos, neg, xcol, ycol, xlabel, ylabel,
                    balance_neg=True, rng=None):
    if balance_neg and len(neg) > len(pos):
        rng = rng or np.random.default_rng(0)
        neg = neg[rng.permutation(len(neg))[:len(pos)]]
    ax.scatter(neg[:, xcol], neg[:, ycol], label="negative", s=2)
    ax.scatter(pos[:, xcol], pos[:, ycol], label="positive", s=2)
    ax.grid(True)
    ax.legend()
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)


def savefig(path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
    print(f"saved {path}")
