"""Episodic few-shot dispersion evaluation (port of reference
scripts/eval_sam3_olive_dispersion.py:1-283).

For each K in --shots and each class: sample N random (K support, 1 query)
episodes, predict the query's binary class mask, and report mean IoU, std,
and 95% CI per class plus the global mIoU — the dispersion (std/CI across
episodes) is the statistic of interest.

Backends:
  --backend nttt   this framework's matching pipeline (fill K refs into a
                   fresh memory bank, run one test step, union the masks of
                   the episode's class) — TPU-native, runs here.
  --backend sam3   the reference's HF SAM3 visual-prompting path (stitched
                   supports + query canvas, box prompts); requires a
                   transformers build with Sam3Model (gated import).
"""
import argparse
import json
import os
import random
import statistics
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_time_to_train_tpu.data.coco_api import COCO


def parse_args():
    p = argparse.ArgumentParser(
        description="Few-shot episodic dispersion evaluation")
    p.add_argument("--coco_json", type=str,
                   default="data/olive_diseases/annotations/"
                           "instances_all.json")
    p.add_argument("--img_dir", type=str,
                   default="data/olive_diseases/all_images")
    p.add_argument("--backend", choices=("nttt", "sam3"), default="nttt")
    p.add_argument("--checkpoint", type=str, default="facebook/sam3",
                   help="sam3 backend model id")
    p.add_argument("--sam2_cfg", type=str, default="sam2_hiera_l.yaml")
    p.add_argument("--sam2_ckpt", type=str, default=None)
    p.add_argument("--encoder", type=str, default="dinov2_large")
    p.add_argument("--encoder_ckpt", type=str, default=None)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--shots", type=str, default="1,2,3,5,10")
    p.add_argument("--episodes", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_json", type=str, default="sam3_olive_results.json")
    return p.parse_args()


def calculate_iou(pred_mask, gt_mask):
    inter = np.logical_and(pred_mask, gt_mask).sum()
    union = np.logical_or(pred_mask, gt_mask).sum()
    if union == 0:
        return 1.0 if inter == 0 else 0.0
    return inter / union


def load_image_and_gt(coco, img_dir, img_id, cat_id):
    """Image (PIL RGB), binary class GT mask, instance boxes (xyxy)."""
    from PIL import Image
    info = coco.loadImgs([img_id])[0]
    image = Image.open(os.path.join(img_dir, info["file_name"])) \
        .convert("RGB")
    anns = coco.loadAnns(coco.getAnnIds(imgIds=img_id, catIds=[cat_id]))
    gt = np.zeros((info["height"], info["width"]), np.uint8)
    boxes = []
    for ann in anns:
        gt = np.maximum(gt, coco.annToMask(ann))
        x, y, w, h = ann["bbox"]
        boxes.append([x, y, x + w, y + h])
    return image, gt, boxes


def build_nttt_backend(args, coco):
    """Per-episode: fresh 1-class memory bank, fill K refs, postprocess,
    one test step on the query, union the winning masks of the class."""
    from no_time_to_train_tpu.models.matching.pipeline import (
        NoAMGMatcher, MatchingConfig, finalize_results)
    from no_time_to_train_tpu.models.matching import memory_bank as mb
    from no_time_to_train_tpu.utils import checkpoint as ckpt_io
    from no_time_to_train_tpu.config.presets import SAM2_PRESETS
    from no_time_to_train_tpu.data.datasets import (_resize_image_bicubic,
                                                    _resize_mask_bilinear)
    import jax

    cfg = SAM2_PRESETS[args.sam2_cfg]
    sam2_params = None
    if args.sam2_ckpt and os.path.exists(args.sam2_ckpt):
        sam2_params = ckpt_io.load_sam2_torch_checkpoint(args.sam2_ckpt, cfg)
    dino_params = None
    if args.encoder_ckpt and os.path.exists(args.encoder_ckpt):
        from no_time_to_train_tpu.config.presets import ENCODER_PRESETS
        dino_params = ckpt_io.load_dino_checkpoint(
            args.encoder_ckpt, ENCODER_PRESETS[args.encoder])
    if sam2_params is None or dino_params is None:
        print("WARNING: missing checkpoints; running with random weights "
              "(smoke mode)")
    dt = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    matcher = NoAMGMatcher(
        cfg, args.encoder, MatchingConfig(compute_dtype=dt), n_classes=1,
        memory_length=max(int(s) for s in args.shots.split(",")),
        sam2_params=sam2_params, dino_params=dino_params, seed=args.seed)
    empty = matcher.bank
    s = args.image_size

    def run(support, query_img):
        matcher.bank = empty  # fresh bank per episode (immutable pytree)
        imgs, masks = [], []
        for img, gt in support:
            imgs.append(_resize_image_bicubic(
                np.asarray(img, np.float32) / 255.0,
                (matcher.enc_cfg.img_size,) * 2))
            masks.append(_resize_mask_bilinear(
                gt.astype(np.float32), (matcher.enc_cfg.img_size,) * 2))
        matcher.fill_memory(np.stack(imgs), np.stack(masks),
                            np.zeros(len(imgs), np.int32))
        matcher.postprocess_memory()
        q = _resize_image_bicubic(
            np.asarray(query_img, np.float32) / 255.0, (s, s))
        out = matcher.test(q)
        fin = finalize_results(out, query_img.height, query_img.width)
        pred = np.zeros((query_img.height, query_img.width), bool)
        for i in range(len(fin["scores"])):
            if fin["scores"][i] > 0.5:
                pred |= fin["binary_masks"][i]
        return pred

    return run


def build_sam3_backend(args):
    import torch
    try:
        from transformers import Sam3Model, Sam3Processor
    except ImportError as e:
        raise SystemExit(
            f"backend sam3 needs transformers with Sam3Model: {e}. "
            "Use --backend nttt for the TPU-native pipeline.")
    from PIL import Image
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = Sam3Model.from_pretrained(args.checkpoint).to(device).eval()
    processor = Sam3Processor.from_pretrained(args.checkpoint)

    def run(support, query_img, target_h=1024):
        import cv2
        # stitch supports left-to-right, query last (reference :69-121)
        resized, boxes_shift, x = [], [], 0
        for img, gt in support:
            w, h = img.size
            sc = target_h / h
            nw = int(w * sc)
            resized.append(img.resize((nw, target_h),
                                      Image.Resampling.LANCZOS))
            ys, xs = np.where(gt > 0)
            if len(xs):
                boxes_shift.append([xs.min() * sc + x, ys.min() * sc,
                                    xs.max() * sc + x, ys.max() * sc])
            x += nw
        qw, qh = query_img.size
        qsc = target_h / qh
        qnw = int(qw * qsc)
        canvas = Image.new("RGB", (x + qnw, target_h))
        xo = 0
        for simg in resized:
            canvas.paste(simg, (xo, 0))
            xo += simg.size[0]
        canvas.paste(query_img.resize((qnw, target_h),
                                      Image.Resampling.LANCZOS), (xo, 0))
        inputs = processor(images=canvas, input_boxes=[boxes_shift],
                           input_boxes_labels=[[1] * len(boxes_shift)],
                           return_tensors="pt").to(device)
        with torch.no_grad():
            outputs = model(**inputs)
        res = processor.post_process_instance_segmentation(
            outputs, threshold=0.5,
            target_sizes=inputs["original_sizes"].tolist())[0]
        pred = np.zeros((qh, qw), np.uint8)
        for mask in res["masks"].cpu().numpy():
            crop = mask[0:target_h, xo:xo + qnw]
            if crop.sum() > 0:
                pred = np.maximum(pred, cv2.resize(
                    crop.astype(np.uint8), (qw, qh),
                    interpolation=cv2.INTER_NEAREST))
        return pred > 0

    return run


def main():
    args = parse_args()
    random.seed(args.seed)
    np.random.seed(args.seed)

    print(f"--- Few-shot dispersion evaluator ({args.backend}) ---")
    coco = COCO(args.coco_json)
    cat_ids = coco.getCatIds()
    cat_names = {c["id"]: c["name"] for c in coco.loadCats(cat_ids)}
    shots_list = [int(s) for s in args.shots.split(",")]
    backend = (build_sam3_backend(args) if args.backend == "sam3"
               else build_nttt_backend(args, coco))

    final = {k: {n: [] for n in cat_names.values()} for k in shots_list}
    for k in shots_list:
        print(f"\n[K={k} shots]")
        for cat_id in cat_ids:
            name = cat_names[cat_id]
            img_ids = list(coco.getImgIds(catIds=[cat_id]))
            if len(img_ids) < k + 1:
                print(f"Skipping {name} (not enough images for {k}-shot)")
                continue
            print(f"  > Class: {name} | Episodes: {args.episodes}")
            for _ in range(args.episodes):
                random.shuffle(img_ids)
                support_ids, query_id = img_ids[:k], img_ids[k]
                try:
                    support = []
                    for sid in support_ids:
                        img, gt, boxes = load_image_and_gt(
                            coco, args.img_dir, sid, cat_id)
                        if len(boxes) > 0:
                            support.append((img, gt))
                    if len(support) < k:
                        continue
                    q_img, q_gt, _ = load_image_and_gt(
                        coco, args.img_dir, query_id, cat_id)
                    pred = backend(support, q_img)
                    final[k][name].append(calculate_iou(pred, q_gt > 0))
                except Exception as e:
                    print(f"    episode error: {type(e).__name__}: {e}")
                    continue

    print("\n\n==========================================")
    print("FINAL RESULTS")
    print("==========================================")
    print(f"{'Shot':<5} | {'Class':<20} | {'Mean IoU':<10} | "
          f"{'Std Dev':<10} | {'95% CI':<10}")
    print("-" * 65)
    for k in shots_list:
        means = []
        for name in cat_names.values():
            scores = final[k][name]
            if not scores:
                continue
            mean = statistics.mean(scores) * 100
            stdev = statistics.stdev(scores) * 100 if len(scores) > 1 else 0.0
            ci = 1.96 * (stdev / np.sqrt(len(scores)))
            means.append(mean)
            print(f"{k:<5} | {name:<20} | {mean:5.2f}      | "
                  f"{stdev:5.2f}      | ±{ci:4.2f}")
        if means:
            print(f"{k:<5} | {'*GLOBAL mIoU*':<20} | "
                  f"{statistics.mean(means):5.2f}      | --          | --")
        print("-" * 65)

    with open(args.out_json, "w") as f:
        json.dump(final, f)
    print(f"Saved full raw data to {args.out_json}")


if __name__ == "__main__":
    main()
