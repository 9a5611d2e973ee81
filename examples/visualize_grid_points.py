#!/usr/bin/env python
"""Visualize the SAM point-prompt grid over an image.

Port of the reference notebook `notebooks/visualize_grid_points.ipynb`: build
the points_per_side x points_per_side query grid exactly as the test pipeline
does (pipeline.grid_points, reference _get_grid_points :335-353), scale it to
the displayed image, and overlay it.

    python examples/visualize_grid_points.py --image cats.jpg \
        --points-per-side 32 --out grid_points.png
"""
import argparse

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from no_time_to_train_tpu.models.matching.pipeline import grid_points


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None,
                   help="optional background image; checkerboard if absent")
    p.add_argument("--sam-input-size", type=int, default=1024)
    p.add_argument("--points-per-side", type=int, default=32)
    p.add_argument("--out", default="grid_points.png")
    a = p.parse_args()

    pts = np.asarray(grid_points(a.points_per_side, a.sam_input_size))
    print(f"{pts.shape[0]} grid points over {a.sam_input_size}px input, "
          f"first={pts[0]}, last={pts[-1]}")

    if a.image:
        from PIL import Image
        img = np.asarray(Image.open(a.image).convert("RGB"))
    else:
        yy, xx = np.mgrid[0:a.sam_input_size, 0:a.sam_input_size]
        img = (((yy // 64 + xx // 64) % 2) * 40 + 180).astype(np.uint8)
        img = np.stack([img] * 3, -1)
    h, w = img.shape[:2]
    # grid coords live in SAM-input space; scale to the displayed image
    sx, sy = w / a.sam_input_size, h / a.sam_input_size

    fig, ax = plt.subplots(figsize=(10, 10 * h / w))
    ax.imshow(img)
    ax.scatter(pts[:, 0] * sx, pts[:, 1] * sy, s=8, c="red", marker="o",
               edgecolors="white", linewidths=0.3)
    ax.set_title(f"{a.points_per_side}x{a.points_per_side} SAM prompt grid")
    ax.axis("off")
    fig.savefig(a.out, dpi=120, bbox_inches="tight")
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
