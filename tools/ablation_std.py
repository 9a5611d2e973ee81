#!/usr/bin/env python
"""Seeds x shots ablation statistics (reference tools/make_plots/ablation_std.py):
reads the aggregated metrics CSV (scripts/aggregate_metrics.py), prints
mean +/- std per shot count, and writes an error-bar plot when matplotlib is
present."""
import argparse
import csv
from collections import defaultdict

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default="work_dirs/metrics.csv")
    p.add_argument("--metric", default="segm_AP")
    p.add_argument("--out-plot", default="work_dirs/ablation_std.png")
    a = p.parse_args()

    by_shots = defaultdict(list)
    with open(a.csv) as f:
        for row in csv.DictReader(f):
            if row.get("shots") and row.get(a.metric):
                by_shots[int(row["shots"])].append(float(row[a.metric]))

    shots = sorted(by_shots)
    means = [float(np.mean(by_shots[s])) for s in shots]
    stds = [float(np.std(by_shots[s])) for s in shots]
    for s, m, sd in zip(shots, means, stds):
        print(f"{s:>3d}-shot {a.metric}: {m:.4f} +/- {sd:.4f} "
              f"(n={len(by_shots[s])})")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(5, 4))
        plt.errorbar(shots, means, yerr=stds, marker="o", capsize=4)
        plt.xlabel("shots")
        plt.ylabel(a.metric)
        plt.title("few-shot ablation (seed std)")
        plt.grid(alpha=0.3)
        plt.savefig(a.out_plot, dpi=150, bbox_inches="tight")
        print(f"plot -> {a.out_plot}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
