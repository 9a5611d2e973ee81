#!/usr/bin/env python
"""Few-shot support-set playground (+ optional SAM3 concept queries).

Port of the reference notebook `notebooks/sam3_playground.ipynb` (8 cells):
sample a K-shot memory set, collect all class*shot support crops with their
GT masks through the fill-crop dataset, render the support grid, and —
when a SAM3-capable transformers build is present — run SAM3 text-prompt
queries on a chosen image (documented external path, gated at import).

    python examples/sam3_playground.py \
        --root data/olive_diseases/train2017 \
        --json data/olive_diseases/annotations/instances_train2017.json \
        --shots 10 --out-dir work_dirs/sam3_playground
"""
import argparse

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import tempfile
from pathlib import Path

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from no_time_to_train_tpu.data.datasets import COCOMemoryFillCropDataset
from no_time_to_train_tpu.data.few_shot_sampling import sample_memory_dataset


def collect_support(root, json_file, shots, image_size, seed,
                    dataset="coco"):
    """All class*shot support crops: list of (cat_ind, img [S,S,3], mask)."""
    pkl = os.path.join(tempfile.mkdtemp(prefix="sam3_pg_"),
                       f"memory_{shots}shot.pkl")
    sample_memory_dataset(json_file, pkl, memory_length=shots,
                          remove_bad=True, dataset=dataset, seed=seed)
    split = None if dataset == "coco" else dataset
    ds = COCOMemoryFillCropDataset(root, json_file, pkl,
                                   image_size=image_size,
                                   memory_length=shots, class_split=split)
    items = [ds[i] for i in range(len(ds))]
    print(f"support set: {len(items)} crops "
          f"({len(set(it['cat_ind'] for it in items))} classes x {shots})")
    return items, ds


def plot_support_grid(items, ds, out_path, max_cols=10):
    n = len(items)
    cols = min(max_cols, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.4 * rows))
    ind_to_name = {v: ds.coco.loadCats([k])[0]["name"]
                   for k, v in ds.cat_ids_to_inds.items()}
    for ax, it in zip(np.atleast_1d(axes).ravel(), items):
        img = np.asarray(it["img"])
        if img.max() > 1.5:
            img = img / 255.0
        ax.imshow(np.clip(img, 0, 1))
        m = np.asarray(it["mask"]) > 0.5
        ov = np.zeros(m.shape + (4,)); ov[m] = (0, 1, 0, 0.35)
        ax.imshow(ov)
        ax.set_title(ind_to_name.get(it["cat_ind"], str(it["cat_ind"])),
                     fontsize=8)
        ax.axis("off")
    for ax in np.atleast_1d(axes).ravel()[n:]:
        ax.axis("off")
    fig.tight_layout(); fig.savefig(out_path, dpi=110); plt.close(fig)
    print(f"wrote {out_path}")


def sam3_text_queries(image_path, prompts, out_dir):
    """Notebook's SAM3 concept-query cells (external torch model, gated)."""
    try:
        import torch
        from transformers import Sam3Model, Sam3Processor
        from PIL import Image
    except ImportError as e:
        print(f"[sam3] unavailable ({e}); skipping text-prompt queries")
        return
    model = Sam3Model.from_pretrained("facebook/sam3")
    proc = Sam3Processor.from_pretrained("facebook/sam3")
    img = Image.open(image_path).convert("RGB")
    for prompt in prompts:
        inputs = proc(images=img, text=prompt, return_tensors="pt")
        with torch.no_grad():
            out = model(**inputs)
        masks = proc.post_process_masks(out.pred_masks,
                                        inputs["original_sizes"])[0]
        fig, ax = plt.subplots(figsize=(8, 8))
        ax.imshow(np.asarray(img))
        for m in np.asarray(masks) > 0:
            ov = np.zeros(m.shape + (4,)); ov[m] = (1, 0, 0, 0.4)
            ax.imshow(ov)
        ax.set_title(f"SAM3: '{prompt}'"); ax.axis("off")
        out_p = Path(out_dir) / f"sam3_{prompt.replace(' ', '_')}.png"
        fig.savefig(out_p, dpi=120); plt.close(fig)
        print(f"wrote {out_p}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="image directory")
    p.add_argument("--json", required=True, help="COCO annotation json")
    p.add_argument("--shots", type=int, default=10)
    p.add_argument("--dataset", default="coco",
                   help="METAINFO class split (e.g. olive_diseases)")
    p.add_argument("--image-size", type=int, default=518)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out-dir", default="work_dirs/sam3_playground")
    p.add_argument("--sam3-image", default=None,
                   help="optional query image for SAM3 text prompts")
    p.add_argument("--sam3-prompts", nargs="*",
                   default=["olive leaf", "disease spot"])
    a = p.parse_args()
    out_dir = Path(a.out_dir); out_dir.mkdir(parents=True, exist_ok=True)

    items, ds = collect_support(a.root, a.json, a.shots, a.image_size,
                                a.seed, dataset=a.dataset)
    plot_support_grid(items, ds, out_dir / "support_grid.png")
    if a.sam3_image:
        sam3_text_queries(a.sam3_image, a.sam3_prompts, out_dir)


if __name__ == "__main__":
    main()
