#!/usr/bin/env python
"""Host-side finalize throughput: the per-image tail that runs on the host
while the device computes the next step — mask upsample 256^2 -> ori size +
binarize, per-mask boxes, COCO RLE encode (runner._finalize_one minus the
dataset/vis plumbing).

This is the number that bounds multi-chip scaling: at the projected v5e-8
rate (~8x the single-chip img/s) one host core must finalize that many
images per second, or the DP loop must shard finalize across workers
(VERDICT r4 #3). Pure host benchmark — never touches a device/backend.

Usage: python tools/bench_finalize.py [--imgs 50] [--masks 100]
                                      [--ori 480x640] [--procs 1]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_raw(rng, n_masks, k_pad=100, lr=256):
    """Synthetic device output shaped like matcher.fetch_test's dict: blobby
    logits (random ellipses) so RLE run counts look like real masks."""
    yy, xx = np.mgrid[0:lr, 0:lr].astype(np.float32)
    logits = np.full((k_pad, lr, lr), -8.0, np.float16)
    for i in range(n_masks):
        cy, cx = rng.uniform(lr * 0.2, lr * 0.8, 2)
        ry, rx = rng.uniform(lr * 0.05, lr * 0.35, 2)
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        logits[i] = (4.0 * (1.0 - d)).astype(np.float16)
    valid = np.arange(k_pad) < n_masks
    return dict(
        lr_logits=logits,
        scores=np.where(valid, rng.uniform(0.3, 0.9, k_pad), 0.0)
        .astype(np.float32),
        labels=rng.integers(0, 20, k_pad).astype(np.int32),
        pred_ious=rng.uniform(0.4, 1.0, k_pad).astype(np.float32),
        valid=valid,
    )


def finalize_one(raw, ori_h, ori_w, cat_ids, fused=True):
    """The deployed per-image host tail (runner._finalize_one without the
    dataset/vis plumbing): fused native finalize when available, else
    finalize_results + the COCO-record encode loop."""
    from no_time_to_train_tpu.models.matching.pipeline import (
        finalize_records, finalize_results)
    from no_time_to_train_tpu.data import rle as rle_mod
    fin = finalize_records(raw, ori_h, ori_w) if fused else None
    if fin is not None:
        recs = []
        for i in range(len(fin["scores"])):
            box = np.asarray(fin["bboxes"][i], np.float64)
            recs.append({
                "image_id": 1,
                "category_id": int(cat_ids[int(fin["labels"][i])]),
                "bbox": [float(box[0]), float(box[1]),
                         float(box[2] - box[0]), float(box[3] - box[1])],
                "score": float(fin["scores"][i]),
                "segmentation": fin["segs"][i],
            })
        return recs
    fin = finalize_results(raw, ori_h, ori_w)
    recs = []
    for i in range(len(fin["scores"])):
        box = np.asarray(fin["bboxes"][i], np.float64)
        seg = rle_mod.encode_mask(fin["binary_masks"][i].astype(np.uint8))
        recs.append({
            "image_id": 1,
            "category_id": int(cat_ids[int(fin["labels"][i])]),
            "bbox": [float(box[0]), float(box[1]),
                     float(box[2] - box[0]), float(box[3] - box[1])],
            "score": float(fin["scores"][i]),
            "segmentation": seg,
        })
    return recs


def run_serial(raws, ori_h, ori_w, cat_ids, fused):
    t0 = time.time()
    n_recs = 0
    for raw in raws:
        n_recs += len(finalize_one(raw, ori_h, ori_w, cat_ids, fused))
    return time.time() - t0, n_recs


def _worker(args):
    raw, ori_h, ori_w, cat_ids, fused = args
    return finalize_one(raw, ori_h, ori_w, cat_ids, fused)


def run_pool(raws, ori_h, ori_w, cat_ids, procs, fused):
    """Process-pool sharding — the DP-loop escape hatch if one core can't
    keep up with 8 chips (numpy/cv2 release the GIL only partially; RLE
    string building is pure Python bytes work, so processes, not threads)."""
    from concurrent.futures import ProcessPoolExecutor
    with ProcessPoolExecutor(max_workers=procs) as ex:
        # warmup: fork + import cost out of the timed section
        list(ex.map(_worker, [(raws[0], ori_h, ori_w, cat_ids, fused)]))
        t0 = time.time()
        n_recs = 0
        for recs in ex.map(_worker,
                           [(r, ori_h, ori_w, cat_ids, fused)
                            for r in raws],
                           chunksize=2):
            n_recs += len(recs)
        dt = time.time() - t0
    return dt, n_recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs", type=int, default=50)
    ap.add_argument("--masks", type=int, default=100,
                    help="valid masks per image (100 = num_out_instance, "
                         "the worst case; COCO-real is ~30-60)")
    ap.add_argument("--ori", default="480x640")
    ap.add_argument("--procs", type=int, default=1)
    ap.add_argument("--split", action="store_true",
                    help="force the split (non-fused) finalize path")
    args = ap.parse_args()
    ori_h, ori_w = (int(v) for v in args.ori.split("x"))

    from no_time_to_train_tpu.utils import native
    rng = np.random.default_rng(0)
    cat_ids = np.arange(1, 21)
    raws = [make_raw(rng, args.masks) for _ in range(min(args.imgs, 8))]
    raws = [raws[i % len(raws)] for i in range(args.imgs)]

    fused = not args.split
    # warmup (native lib autobuild, cv2 init)
    finalize_one(raws[0], ori_h, ori_w, cat_ids, fused)

    if args.procs > 1:
        dt, n_recs = run_pool(raws, ori_h, ori_w, cat_ids, args.procs,
                              fused)
    else:
        dt, n_recs = run_serial(raws, ori_h, ori_w, cat_ids, fused)
    per = dt / args.imgs
    print(f"# finalize: {1000 * per:.1f} ms/img = {1.0 / per:.1f} img/s "
          f"({args.masks} masks/img, {ori_h}x{ori_w}, procs={args.procs}, "
          f"fused={fused and native.has_finalize()}, "
          f"native={native.available()}, {n_recs} records)")


if __name__ == "__main__":
    main()
