#!/usr/bin/env python
"""SAM2 vs SAM3 with a single bounding-box prompt.

Port of the reference notebook `notebooks/sam2 vs sam3.ipynb` (7 cells): one
box around the left cat of cats.jpg; SAM2 (instance model) should segment only
the prompted cat, SAM3 (concept model) may also segment the right cat of the
same semantic class. The SAM2 side runs natively here through this
framework's image predictor; the SAM3 side is the documented external path
(HuggingFace Sam3Model + Sam3Processor), gated at import like
scripts/eval_sam3_video_olive.py.

    python examples/sam2_vs_sam3_box_prompt.py --image cats.jpg \
        --box 10 20 300 500 --sam2-ckpt checkpoints/sam2_hiera_large.pt \
        --out sam2_vs_sam3.png
"""
import argparse

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.patches as patches


def run_sam2(image, box, sam2_cfg, sam2_ckpt):
    """Our TPU-native predictor: box prompt -> best mask (multimask ranked
    by predicted IoU, matching the notebook's multimask_output=True pick)."""
    from no_time_to_train_tpu.config.presets import SAM2_PRESETS
    from no_time_to_train_tpu.models.sam2.image_predictor import (
        SAM2ImagePredictor)
    from no_time_to_train_tpu.utils.checkpoint import (
        load_sam2_torch_checkpoint)
    cfg = SAM2_PRESETS[sam2_cfg]
    params = load_sam2_torch_checkpoint(sam2_ckpt, cfg) if sam2_ckpt else None
    pred = SAM2ImagePredictor(cfg, params=params)
    pred.set_image(image)
    masks, ious, _ = pred.predict(box=np.asarray(box, np.float32),
                                  multimask_output=True)
    best = int(np.argmax(ious))
    return np.asarray(masks[best]) > 0, float(ious[best])


def run_sam3(image, box):
    """Reference notebook's SAM3 side (external torch model, gated)."""
    try:
        import torch
        from transformers import Sam3Model, Sam3Processor
    except ImportError as e:
        print(f"[sam3] unavailable in this environment ({e}); skipping — "
              "install a transformers build that ships SAM3 to enable")
        return None
    model = Sam3Model.from_pretrained("facebook/sam3")
    processor = Sam3Processor.from_pretrained("facebook/sam3")
    inputs = processor(images=image, input_boxes=[[list(box)]],
                       return_tensors="pt")
    with torch.no_grad():
        out = model(**inputs)
    masks = processor.post_process_masks(
        out.pred_masks, inputs["original_sizes"])[0]
    return np.asarray(masks[0]) > 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--box", type=float, nargs=4, required=True,
                   metavar=("X1", "Y1", "X2", "Y2"))
    p.add_argument("--sam2-cfg", default="sam2_hiera_l.yaml")
    p.add_argument("--sam2-ckpt", default=None)
    p.add_argument("--out", default="sam2_vs_sam3.png")
    a = p.parse_args()

    from PIL import Image
    image = np.asarray(Image.open(a.image).convert("RGB"))
    x1, y1, x2, y2 = a.box

    sam2_mask, sam2_iou = run_sam2(image, a.box, a.sam2_cfg, a.sam2_ckpt)
    sam3_mask = run_sam3(image, a.box)

    panels = [("box prompt", None), (f"SAM2 (iou {sam2_iou:.2f})", sam2_mask)]
    if sam3_mask is not None:
        panels.append(("SAM3", sam3_mask))
    fig, axes = plt.subplots(1, len(panels), figsize=(6 * len(panels), 8))
    for ax, (title, mask) in zip(np.atleast_1d(axes), panels):
        ax.imshow(image)
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       fill=False, edgecolor="yellow",
                                       linewidth=2))
        if mask is not None:
            ov = np.zeros(mask.shape + (4,))
            ov[mask] = (0.1, 0.5, 1.0, 0.45)
            ax.imshow(ov)
        ax.set_title(title); ax.axis("off")
    fig.tight_layout(); fig.savefig(a.out, dpi=120)
    print(f"wrote {a.out}"
          + ("" if sam3_mask is not None else " (SAM2 panel only)"))


if __name__ == "__main__":
    main()
