#!/usr/bin/env python
"""Olive-diseases dataset EDA (train + val only), as a runnable script.

Port of the reference notebook `notebooks/eda_olive_diseases.ipynb` (28 cells):
per-split annotation/image tables, class distribution, images-per-class,
image-resolution analysis, bbox-size/aspect analysis, annotation density,
qualitative bbox samples, and thesis-figure export. The test2017 split is
intentionally excluded, matching the notebook.

    python examples/eda_olive_diseases.py --dataset-root data/olive_diseases \
        --out-dir work_dirs/olive_eda

Runs against any COCO-format dataset (annotations/instances_{split}.json +
{split}/ image dirs). With --synthetic it fabricates a tiny dataset in a temp
dir first, so the full analysis path is exercisable without data.
"""
import argparse
import json
import os
from collections import Counter
from pathlib import Path

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.patches as patches

SPLITS = ("train2017", "val2017")  # test2017 deliberately excluded


def load_coco(path):
    with open(path) as f:
        d = json.load(f)
    cats = {c["id"]: c["name"] for c in d.get("categories", [])}
    imgs = {im["id"]: im for im in d.get("images", [])}
    return d, cats, imgs


def build_tables(dataset_root):
    """-> (ann_rows, img_rows, cat_names). One dict per annotation / image."""
    ann_rows, img_rows, cat_names = [], [], {}
    for split in SPLITS:
        path = Path(dataset_root) / "annotations" / f"instances_{split}.json"
        if not path.exists():
            print(f"[skip] {path} not found")
            continue
        d, cats, imgs = load_coco(path)
        cat_names.update(cats)
        for im in d["images"]:
            img_rows.append(dict(split=split, id=im["id"],
                                 file_name=im.get("file_name", ""),
                                 width=im["width"], height=im["height"]))
        for a in d["annotations"]:
            im = imgs[a["image_id"]]
            x, y, w, h = a["bbox"]
            ann_rows.append(dict(
                split=split, image_id=a["image_id"],
                category=cats.get(a["category_id"], str(a["category_id"])),
                bbox_w=w, bbox_h=h, bbox_area=w * h,
                bbox_area_ratio=(w * h) / max(im["width"] * im["height"], 1),
                bbox_aspect=w / max(h, 1e-6)))
    return ann_rows, img_rows, cat_names


def check_split_overlap(img_rows):
    names = {}
    for r in img_rows:
        names.setdefault(r["split"], set()).add(r["file_name"])
    tr, va = names.get("train2017", set()), names.get("val2017", set())
    overlap = tr & va
    print(f"train imgs: {len(tr)}, val imgs: {len(va)}, "
          f"filename overlap: {len(overlap)}")
    return overlap


def summarize(ann_rows, img_rows):
    print("\n== per-split summary ==")
    for split in SPLITS:
        n_img = sum(1 for r in img_rows if r["split"] == split)
        anns = [r for r in ann_rows if r["split"] == split]
        if not n_img:
            continue
        print(f"{split}: {n_img} images, {len(anns)} annotations, "
              f"{len(anns) / n_img:.2f} ann/img, "
              f"{len(set(a['category'] for a in anns))} classes")


def plot_class_distribution(ann_rows, out_dir):
    fig, axes = plt.subplots(1, 2, figsize=(16, 5), sharey=True)
    for ax, split in zip(axes, SPLITS):
        counts = Counter(r["category"] for r in ann_rows
                         if r["split"] == split)
        if not counts:
            continue
        ks, vs = zip(*sorted(counts.items(), key=lambda kv: -kv[1]))
        ax.bar(ks, vs)
        ax.set_title(f"annotations per class — {split}")
        ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out_dir / "class_distribution.png", dpi=120)
    plt.close(fig)


def plot_images_per_class(ann_rows, out_dir):
    fig, axes = plt.subplots(1, 2, figsize=(16, 5), sharey=True)
    for ax, split in zip(axes, SPLITS):
        per_cat = {}
        for r in ann_rows:
            if r["split"] == split:
                per_cat.setdefault(r["category"], set()).add(r["image_id"])
        if not per_cat:
            continue
        items = sorted(per_cat.items(), key=lambda kv: -len(kv[1]))
        ax.bar([k for k, _ in items], [len(v) for _, v in items])
        ax.set_title(f"images per class — {split}")
        ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out_dir / "images_per_class.png", dpi=120)
    plt.close(fig)


def plot_resolutions(img_rows, out_dir):
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    ws = [r["width"] for r in img_rows]
    hs = [r["height"] for r in img_rows]
    if ws:
        axes[0].hist2d(ws, hs, bins=30)
        axes[0].set_xlabel("width"); axes[0].set_ylabel("height")
        axes[0].set_title("image resolutions")
        mp = [w * h / 1e6 for w, h in zip(ws, hs)]
        axes[1].hist(mp, bins=40)
        axes[1].set_xlabel("megapixels"); axes[1].set_title("image size (MP)")
        print(f"\nresolutions: {len(set(zip(ws, hs)))} distinct, "
              f"median {int(np.median(ws))}x{int(np.median(hs))}")
    fig.tight_layout()
    fig.savefig(out_dir / "image_resolutions.png", dpi=120)
    plt.close(fig)


def plot_bbox_stats(ann_rows, out_dir):
    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    ratio = [r["bbox_area_ratio"] for r in ann_rows
             if np.isfinite(r["bbox_area_ratio"])]
    aspect = [r["bbox_aspect"] for r in ann_rows
              if np.isfinite(r["bbox_aspect"])]
    if ratio:
        axes[0].hist(ratio, bins=50)
        axes[0].set_title("bbox area / image area")
        axes[1].hist(np.clip(aspect, 0, 5), bins=50)
        axes[1].set_title("bbox aspect ratio (w/h, clipped at 5)")
        per_img = Counter((r["split"], r["image_id"]) for r in ann_rows)
        axes[2].hist(list(per_img.values()),
                     bins=np.arange(0.5, max(per_img.values()) + 1.5))
        axes[2].set_title("annotations per image")
        print(f"bbox area ratio: median {np.median(ratio):.4f}, "
              f"p90 {np.percentile(ratio, 90):.4f}")
    fig.tight_layout()
    fig.savefig(out_dir / "bbox_stats.png", dpi=120)
    plt.close(fig)


def draw_sample_bboxes(dataset_root, split, out_dir, n_samples=4, seed=0):
    path = Path(dataset_root) / "annotations" / f"instances_{split}.json"
    img_dir = Path(dataset_root) / split
    if not path.exists():
        return
    d, cats, imgs = load_coco(path)
    by_img = {}
    for a in d["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    rng = np.random.default_rng(seed)
    ids = rng.permutation(sorted(by_img))[:n_samples]
    fig, axes = plt.subplots(1, max(len(ids), 1), figsize=(5 * len(ids), 5))
    axes = np.atleast_1d(axes)
    for ax, iid in zip(axes, ids):
        im = imgs[iid]
        f = img_dir / im.get("file_name", "")
        if f.exists():
            from PIL import Image
            ax.imshow(np.asarray(Image.open(f).convert("RGB")))
        else:
            ax.imshow(np.zeros((im["height"], im["width"], 3), np.uint8))
        for a in by_img[iid]:
            x, y, w, h = a["bbox"]
            ax.add_patch(patches.Rectangle((x, y), w, h, fill=False,
                                           edgecolor="lime", linewidth=2))
            ax.text(x, y - 2, cats.get(a["category_id"], "?"),
                    color="lime", fontsize=8)
        ax.set_title(f"{split} #{iid}"); ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_dir / f"samples_{split}.png", dpi=120)
    plt.close(fig)


def export_thesis_figures(ann_rows, out_dir):
    """Combined per-class figure (PNG + PDF) + a csv usable by typst/cetz,
    mirroring the notebook's thesis-export cells."""
    per_cat_ann = Counter(r["category"] for r in ann_rows)
    per_cat_img = {}
    for r in ann_rows:
        per_cat_img.setdefault(r["category"], set()).add(
            (r["split"], r["image_id"]))
    if not per_cat_ann:
        return
    cats_sorted = sorted(per_cat_ann, key=lambda c: -per_cat_ann[c])
    fig, ax = plt.subplots(figsize=(10, 5))
    x = np.arange(len(cats_sorted))
    ax.bar(x - 0.2, [per_cat_ann[c] for c in cats_sorted], 0.4,
           label="annotations")
    ax.bar(x + 0.2, [len(per_cat_img[c]) for c in cats_sorted], 0.4,
           label="images")
    ax.set_xticks(x, cats_sorted, rotation=45, ha="right")
    ax.legend(); ax.set_title("olive diseases: class statistics")
    fig.tight_layout()
    fig.savefig(out_dir / "thesis_class_stats.png", dpi=200)
    fig.savefig(out_dir / "thesis_class_stats.pdf")
    plt.close(fig)
    with open(out_dir / "thesis_class_stats.csv", "w") as f:
        f.write("category,annotations,images\n")
        for c in cats_sorted:
            f.write(f"{c},{per_cat_ann[c]},{len(per_cat_img[c])}\n")


def make_synthetic(root):
    rng = np.random.default_rng(0)
    cats = [{"id": i + 1, "name": n} for i, n in
            enumerate(["anthracnose", "peacock_spot", "healthy"])]
    (Path(root) / "annotations").mkdir(parents=True, exist_ok=True)
    for split, n in (("train2017", 12), ("val2017", 6)):
        imgs, anns = [], []
        aid = 1
        for i in range(n):
            w, h = int(rng.integers(320, 800)), int(rng.integers(320, 800))
            imgs.append({"id": i + 1, "file_name": f"{i:06d}.jpg",
                         "width": w, "height": h})
            for _ in range(int(rng.integers(1, 5))):
                bw, bh = rng.uniform(10, w / 2), rng.uniform(10, h / 2)
                anns.append({"id": aid, "image_id": i + 1,
                             "category_id": int(rng.integers(1, 4)),
                             "bbox": [float(rng.uniform(0, w - bw)),
                                      float(rng.uniform(0, h - bh)),
                                      float(bw), float(bh)],
                             "area": float(bw * bh), "iscrowd": 0})
                aid += 1
        with open(Path(root) / "annotations" /
                  f"instances_{split}.json", "w") as f:
            json.dump({"images": imgs, "annotations": anns,
                       "categories": cats}, f)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-root", default="data/olive_diseases")
    p.add_argument("--out-dir", default="work_dirs/olive_eda")
    p.add_argument("--synthetic", action="store_true",
                   help="fabricate a tiny dataset and run on it")
    a = p.parse_args()
    root = a.dataset_root
    if a.synthetic:
        import tempfile
        root = make_synthetic(tempfile.mkdtemp(prefix="olive_eda_"))
        print(f"synthetic dataset at {root}")
    out_dir = Path(a.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    ann_rows, img_rows, _ = build_tables(root)
    if not ann_rows:
        raise SystemExit("no annotations found — pass --dataset-root or "
                         "--synthetic")
    check_split_overlap(img_rows)
    summarize(ann_rows, img_rows)
    plot_class_distribution(ann_rows, out_dir)
    plot_images_per_class(ann_rows, out_dir)
    plot_resolutions(img_rows, out_dir)
    plot_bbox_stats(ann_rows, out_dir)
    for split in SPLITS:
        draw_sample_bboxes(root, split, out_dir)
    export_thesis_figures(ann_rows, out_dir)
    print(f"\nfigures written to {out_dir}/")


if __name__ == "__main__":
    main()
