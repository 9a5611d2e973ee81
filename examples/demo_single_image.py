#!/usr/bin/env python
"""Single-image demo (BASELINE config 1 shape: Hiera-T, 1-shot, one reference
mask, one query image — e.g. the reference's notebooks/cats.jpg).

    python examples/demo_single_image.py \
        --ref-image cat1.jpg --ref-mask cat1_mask.png \
        --query-image cats.jpg --sam2-ckpt checkpoints/sam2_hiera_tiny.pt \
        --out overlay.png
"""
import argparse

import numpy as np
from PIL import Image

from no_time_to_train_tpu.config.presets import SAM2_PRESETS
from no_time_to_train_tpu.data.datasets import load_image
from no_time_to_train_tpu.models.matching.pipeline import (NoAMGMatcher,
                                                           MatchingConfig,
                                                           finalize_results)
from no_time_to_train_tpu.utils.checkpoint import (load_sam2_torch_checkpoint,
                                                   load_dino_checkpoint)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref-image", required=True)
    p.add_argument("--ref-mask", required=True)
    p.add_argument("--query-image", required=True)
    p.add_argument("--sam2-cfg", default="sam2_hiera_t.yaml")
    p.add_argument("--sam2-ckpt", default=None)
    p.add_argument("--encoder", default="dinov2_small")
    p.add_argument("--encoder-ckpt", default=None)
    p.add_argument("--out", default="demo_out.png")
    a = p.parse_args()

    sam2_params = dino_params = None
    cfg = SAM2_PRESETS[a.sam2_cfg]
    if a.sam2_ckpt:
        sam2_params = load_sam2_torch_checkpoint(a.sam2_ckpt, cfg)
    from no_time_to_train_tpu.config.presets import ENCODER_PRESETS
    if a.encoder_ckpt:
        dino_params = load_dino_checkpoint(a.encoder_ckpt,
                                           ENCODER_PRESETS[a.encoder])

    matcher = NoAMGMatcher(a.sam2_cfg, a.encoder, MatchingConfig(),
                           n_classes=1, memory_length=1,
                           sam2_params=sam2_params, dino_params=dino_params)

    ref_img, _, _ = load_image(a.ref_image, image_size=518)
    mask = np.asarray(Image.open(a.ref_mask).convert("L"),
                      np.float32) / 255.0
    matcher.fill_memory(ref_img[None], mask[None], [0])
    matcher.postprocess_memory()

    query, oh, ow = load_image(a.query_image, image_size=cfg.image_size)
    raw = matcher.test(query)
    fin = finalize_results(raw, oh, ow)
    print(f"{len(fin['scores'])} detections; top scores: "
          f"{np.round(fin['scores'][:5], 3)}")

    from no_time_to_train_tpu.data.visualization import _overlay_masks
    base = Image.open(a.query_image).convert("RGB")
    out = _overlay_masks(base, fin["binary_masks"], fin["labels"])
    out.save(a.out)
    print(f"overlay -> {a.out}")


if __name__ == "__main__":
    main()
