#!/usr/bin/env python
"""Browse ground-truth annotations of a COCO-format dataset split.

Port of the reference notebook `notebooks/visualize_olive.ipynb`: pick random
images from a split, draw their GT boxes (and polygon/RLE masks when present)
with per-category colors, save a panel per image.

    python examples/visualize_olive_dataset.py \
        --dataset-root data/olive_diseases --split train2017 --n 6 \
        --out-dir work_dirs/olive_vis
"""
import argparse

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
from pathlib import Path

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.patches as patches

from no_time_to_train_tpu.data.coco_api import COCO


def color_for(cat_id):
    rng = np.random.default_rng(cat_id * 7919)
    return rng.uniform(0.2, 1.0, 3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-root", default="data/olive_diseases")
    p.add_argument("--split", default="train2017")
    p.add_argument("--n", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default="work_dirs/olive_vis")
    a = p.parse_args()

    ann_file = (Path(a.dataset_root) / "annotations" /
                f"instances_{a.split}.json")
    img_dir = Path(a.dataset_root) / a.split
    coco = COCO(str(ann_file))
    cats = {c["id"]: c["name"] for c in coco.loadCats(coco.getCatIds())}
    img_ids = coco.getImgIds()
    print(f"{len(img_ids)} images, {len(cats)} categories: "
          f"{sorted(cats.values())}")

    rng = np.random.default_rng(a.seed)
    picks = rng.permutation(img_ids)[:a.n]
    out_dir = Path(a.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for iid in picks:
        im = coco.loadImgs([int(iid)])[0]
        anns = coco.loadAnns(coco.getAnnIds(imgIds=[int(iid)]))
        fig, ax = plt.subplots(figsize=(8, 8))
        f = img_dir / im.get("file_name", "")
        if f.exists():
            from PIL import Image
            ax.imshow(np.asarray(Image.open(f).convert("RGB")))
        else:
            ax.imshow(np.zeros((im["height"], im["width"], 3), np.uint8))
            ax.text(10, 20, "(image file missing)", color="w")
        for ann in anns:
            c = color_for(ann["category_id"])
            x, y, w, h = ann["bbox"]
            ax.add_patch(patches.Rectangle((x, y), w, h, fill=False,
                                           edgecolor=c, linewidth=2))
            ax.text(x, max(y - 3, 0), cats.get(ann["category_id"], "?"),
                    color=c, fontsize=9, weight="bold")
            if ann.get("segmentation"):
                m = coco.annToMask(ann).astype(float)
                overlay = np.zeros(m.shape + (4,))
                overlay[m > 0] = (*c, 0.35)
                ax.imshow(overlay)
        ax.set_title(f"{a.split} image {im['id']} — {len(anns)} annotations")
        ax.axis("off")
        out = out_dir / f"gt_{a.split}_{im['id']}.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
