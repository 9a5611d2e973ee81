#!/usr/bin/env python
"""Few-shot segmentation via video propagation (reference
scripts/eval_sam3_video_olive.py:181-249 reframed on OUR SAM2 video
predictor): supports are prompted frames of a pseudo-video, the query image is
the last frame; masks propagate through SAM2's memory attention and the
last-frame predictions are evaluated COCO-style.

The reference harness drives HF's Sam3TrackerVideoModel (external torch);
this is the same protocol on the TPU-native SAM2VideoPredictor, which is what
it is benchmarked against in the SAM3-comparison study.
"""
import argparse
import json
import os
import time

import numpy as np

from no_time_to_train_tpu.config.presets import SAM2_PRESETS
from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.cocoeval import COCOeval
from no_time_to_train_tpu.data import rle as rle_mod
from no_time_to_train_tpu.data.datasets import load_image, _resize_mask_nearest
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor
from no_time_to_train_tpu.ops.resize import resize_hw
from no_time_to_train_tpu.utils.checkpoint import load_sam2_torch_checkpoint
from no_time_to_train_tpu.utils.profiling import Timer, device_memory_stats


def build_predictor(sam2_cfg="sam2_hiera_l.yaml", ckpt=None):
    cfg = SAM2_PRESETS[sam2_cfg]
    model = SAM2(cfg)
    if ckpt and os.path.exists(ckpt):
        params = load_sam2_torch_checkpoint(ckpt, cfg)
    else:
        from no_time_to_train_tpu.models.matching.pipeline import (
            _random_params_like)
        import jax
        import jax.numpy as jnp
        params = _random_params_like(
            lambda k: model.init(k, jnp.zeros((1, cfg.image_size,
                                               cfg.image_size, 3)),
                                 method=model.init_everything),
            jax.random.PRNGKey(0), 0)
    return SAM2VideoPredictor(model, params)


def propagate_one_query(pred, support_imgs, support_masks, query_img):
    """supports + query as a pseudo-video; returns last-frame low-res logits
    per support object (reference :181-249)."""
    import jax.numpy as jnp
    frames = np.stack(list(support_imgs) + [query_img])
    state = pred.init_state(frames)
    for t, mask in enumerate(support_masks):
        pred.add_new_mask(state, t, obj_id=t + 1, mask=mask)
    last = len(frames) - 1
    out = None
    for fidx, obj_ids, logits in pred.propagate_in_video(state):
        if fidx == last:
            out = logits
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test-json", required=True)
    p.add_argument("--test-root", required=True)
    p.add_argument("--memory-pkl", required=True)
    p.add_argument("--train-json", required=True)
    p.add_argument("--train-root", required=True)
    p.add_argument("--sam2-cfg", default="sam2_hiera_l.yaml")
    p.add_argument("--sam2-ckpt", default="./checkpoints/sam2_hiera_large.pt")
    p.add_argument("--n-shot", type=int, default=3)
    p.add_argument("--out-json", default="video_olive_results.json")
    p.add_argument("--max-images", type=int, default=None)
    a = p.parse_args()

    import pickle
    pred = build_predictor(a.sam2_cfg, a.sam2_ckpt)
    s = pred.cfg.image_size
    train = COCO(a.train_json)
    with open(a.memory_pkl, "rb") as f:
        memory = pickle.load(f)

    supports = {}
    for cat_id, refs in memory.items():
        imgs, masks = [], []
        for d in refs[: a.n_shot]:
            info = train.loadImgs([d["img_id"]])[0]
            img, _, _ = load_image(os.path.join(a.train_root,
                                                info["file_name"]),
                                   image_size=s)
            ann = train.loadAnns(d["ann_ids"])[0]
            m = _resize_mask_nearest(train.annToMask(ann).astype(np.float32),
                                     (s, s))
            imgs.append(img)
            masks.append(m)
        supports[cat_id] = (imgs, masks)

    test = COCO(a.test_json)
    img_ids = sorted(test.imgs.keys())
    if a.max_images:
        img_ids = img_ids[: a.max_images]

    import jax.numpy as jnp
    timer = Timer()
    results = []
    for n, img_id in enumerate(img_ids):
        info = test.loadImgs([img_id])[0]
        query, oh, ow = load_image(os.path.join(a.test_root,
                                                info["file_name"]),
                                   image_size=s)
        with timer.step():
            for cat_id, (simgs, smasks) in supports.items():
                logits = propagate_one_query(pred, simgs, smasks, query)
                for obj_logit in logits:
                    up = np.asarray(resize_hw(jnp.asarray(obj_logit),
                                              (oh, ow), mode="bilinear"))
                    mask = up > 0
                    if not mask.any():
                        continue
                    ys, xs = np.nonzero(mask)
                    score = float(1.0 / (1.0 + np.exp(
                        -float(obj_logit.max()))))
                    results.append({
                        "image_id": img_id, "category_id": int(cat_id),
                        "score": score,
                        "bbox": [float(xs.min()), float(ys.min()),
                                 float(xs.max() - xs.min()),
                                 float(ys.max() - ys.min())],
                        "segmentation": rle_mod.encode_mask(mask)})
        if (n + 1) % 10 == 0:
            print(f"{n + 1}/{len(img_ids)}", device_memory_stats())

    timer.report()
    with open(a.out_json, "w") as f:
        json.dump(results, f)
    if results:
        res = test.loadRes(results)
        for iou_type in ("bbox", "segm"):
            ev = COCOeval(test, res, iou_type)
            ev.evaluate()
            ev.accumulate()
            ev.summarize()


if __name__ == "__main__":
    main()
