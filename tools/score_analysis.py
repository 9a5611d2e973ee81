#!/usr/bin/env python
"""Score-analysis utilities (reference tools/analysis_scripts/*: similarity vs
predicted-IoU vs oracle-IoU correlation, per-class score distributions).

Consumes the scalars pickle the runner dumps in test mode
(`scalars_all.pkl`: per-image dict(scores, labels, pred_ious)) plus an
optional GT json for oracle IoU.
"""
import argparse
import pickle
from collections import defaultdict

import numpy as np


def load_scalars(path):
    with open(path, "rb") as f:
        data = pickle.load(f)
    if data and not isinstance(data[0], dict):
        # runner array format: scalars [sim, cat, oracle, mem_ins_sim] or
        # triplets [sim, pred_iou, oracle] -> adapt to the dict view
        out = []
        for arr in data:
            arr = np.asarray(arr)
            trip = arr.shape[1] == 3
            out.append(dict(
                scores=arr[:, 0],
                labels=(np.zeros(len(arr)) if trip else arr[:, 1]).astype(int),
                pred_ious=arr[:, 1] if trip else arr[:, 3],
                valid=np.ones(len(arr), bool)))
        return out
    return data


def correlation_report(scalars):
    sims = np.concatenate([s["scores"][s["valid"]] for s in scalars])
    pious = np.concatenate([s["pred_ious"][s["valid"]] for s in scalars])
    if len(sims) < 2:
        print("not enough detections")
        return None
    r = float(np.corrcoef(sims, pious)[0, 1])
    print(f"n={len(sims)}  corr(similarity, predicted IoU) = {r:.3f}")
    print(f"similarity: mean {sims.mean():.3f}  std {sims.std():.3f}")
    print(f"pred IoU:   mean {pious.mean():.3f}  std {pious.std():.3f}")
    return r


def per_class_report(scalars, class_names=None):
    by_class = defaultdict(list)
    for s in scalars:
        for c, sc, v in zip(s["labels"], s["scores"], s["valid"]):
            if v:
                by_class[int(c)].append(float(sc))
    print(f"{'class':>20s} {'n':>6s} {'mean':>7s} {'p90':>7s}")
    for c in sorted(by_class):
        v = np.asarray(by_class[c])
        name = class_names[c] if class_names and c < len(class_names) else str(c)
        print(f"{name:>20s} {len(v):>6d} {v.mean():>7.3f} "
              f"{np.percentile(v, 90):>7.3f}")
    return by_class


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scalars", default="scalars_all.pkl")
    a = p.parse_args()
    scalars = load_scalars(a.scalars)
    correlation_report(scalars)
    per_class_report(scalars)


if __name__ == "__main__":
    main()
