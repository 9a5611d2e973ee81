#!/usr/bin/env python
"""Automatic-mask-generation throughput (SAM2-L @ 1024^2, 32x32 point grid)
on the available accelerator.

The reference's AMG has no committed throughput numbers either (its
automatic_mask_generator.py runs a host loop of 64-point microbatches with
host-side MaskData filtering, notebooks/automatic_mask_generator_example);
this is the standalone number for the TPU port, whose whole grid decodes in
ONE jitted program with on-device filters (models/sam2/amg.py). Wall time is
end-to-end `generate()` — device decode + the host record-extraction loop —
which is what a notebook user experiences per image.

Usage: python tools/bench_amg.py [--imgs 4] [--points 32] [--size 1024]
                                 [--point-bs 256] [--m2m] [--crops N]
                                 [--iou-thresh 0.8] [--stab-thresh 0.95]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs", type=int, default=4)
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--point-bs", type=int, default=256)
    ap.add_argument("--m2m", action="store_true")
    ap.add_argument("--crops", type=int, default=0, help="crop_n_layers")
    ap.add_argument("--iou-thresh", type=float, default=0.8)
    ap.add_argument("--stab-thresh", type=float, default=0.95)
    ap.add_argument("--config", default="sam2_hiera_l.yaml")
    args = ap.parse_args()
    if args.imgs < 1:
        ap.error(f"--imgs must be >= 1 (got {args.imgs})")

    from no_time_to_train_tpu.utils.cache import (enable_compilation_cache,
                                                  init_backend_bounded)
    enable_compilation_cache()
    init_backend_bounded(what="bench_amg jax backend init")
    import jax
    import dataclasses
    import jax.numpy as jnp

    from no_time_to_train_tpu.config.presets import SAM2_PRESETS
    from no_time_to_train_tpu.models.matching.pipeline import (
        _random_params_like)
    from no_time_to_train_tpu.models.sam2.model import SAM2
    from no_time_to_train_tpu.models.sam2.amg import (
        SAM2AutomaticMaskGenerator)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = dataclasses.replace(SAM2_PRESETS[args.config],
                              image_size=args.size)
    model = SAM2(cfg, dtype=dtype)

    t0 = time.time()
    key = jax.random.PRNGKey(0)
    params = _random_params_like(
        lambda k: model.init(k, jnp.zeros((1, args.size, args.size, 3)),
                             method=model.init_everything),
        key, 0, cache_tag=("sam2", repr(cfg)))
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda a: (np.asarray(a).astype(np.dtype(dtype))
                       if jnp.issubdtype(np.asarray(a).dtype, jnp.floating)
                       else np.asarray(a)), params)
    from no_time_to_train_tpu.utils.transfer import packed_device_put
    params = packed_device_put(params)  # one transfer/dtype over the tunnel
    amg = SAM2AutomaticMaskGenerator(
        model, params, points_per_side=args.points,
        points_per_batch=args.point_bs, pred_iou_thresh=args.iou_thresh,
        stability_score_thresh=args.stab_thresh, crop_n_layers=args.crops,
        use_m2m=args.m2m, output_mode="coco_rle")
    init_s = time.time() - t0

    rng = np.random.default_rng(0)
    imgs = []
    for i in range(args.imgs):
        img = rng.random((args.size, args.size, 3)).astype(np.float32)
        # a few bright rectangles so some candidates survive the filters
        for j in range(4):
            y0 = (args.size // 8 + 101 * (i + j)) % (args.size // 2)
            x0 = (args.size // 8 + 157 * (i + 2 * j)) % (args.size // 2)
            img[y0:y0 + args.size // 4, x0:x0 + args.size // 4] = \
                0.2 + 0.2 * j
        imgs.append(img)

    t0 = time.time()
    recs = amg.generate(imgs[0])
    compile_s = time.time() - t0

    n_recs = []
    t0 = time.time()
    for i in range(args.imgs):
        n_recs.append(len(amg.generate(imgs[i])))
    dt = (time.time() - t0) / args.imgs
    n_masks = float(np.mean(n_recs)) if n_recs else 0.0

    print(f"# init {init_s:.1f}s, first image (compile) {compile_s:.1f}s, "
          f"steady {1000 * dt:.0f} ms/img = {1.0 / dt:.2f} img/s "
          f"({args.points}x{args.points} grid, m2m={args.m2m}, "
          f"crops={args.crops}, point_bs={args.point_bs}, "
          f"{n_masks:.0f} masks/img kept (first: {len(recs)}), "
          f"backend={jax.default_backend()})", file=sys.stderr)
    if n_masks == 0:
        # with random weights the IoU/stability filters can reject every
        # candidate; the wall time is then decode-only (no host record
        # extraction) and NOT comparable to a real-workload AMG number
        print("# WARNING: 0 masks survived the filters — steady ms/img is "
              "decode-only; lower --iou-thresh/--stab-thresh for a "
              "record-extraction-inclusive number", file=sys.stderr)


if __name__ == "__main__":
    main()
