#!/usr/bin/env python
"""Train the SAM2Ref custom-IoU head (the reference's legacy `fit` path,
pl_wrapper/sam2ref_pl.py): frozen SAM2, AdamW with no-decay split, linear
warmup + multi-step decay, lr scaled by total batch size; L1 IoU regression
against matched oracle IoU."""
import argparse
import os
import pickle

import numpy as np

from no_time_to_train_tpu.config.presets import SAM2_PRESETS
from no_time_to_train_tpu.data.datasets import COCORefTrainDataset
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.sam2ref import SAM2Ref, Sam2RefConfig
from no_time_to_train_tpu.utils.checkpoint import load_sam2_torch_checkpoint


def make_batch(ds, idxs, n_cat_max, n_refs, n_points, n_ins_max, image_size):
    """Collate dataset items into the fixed-shape training batch."""
    import jax.numpy as jnp
    g = len(idxs) * n_cat_max
    s = image_size
    s4 = s // 4
    tar = np.zeros((g, s, s, 3), np.float32)
    refs = np.zeros((g, n_refs, s, s, 3), np.float32)
    rmask = np.zeros((g, n_refs, s, s), np.float32)
    qpts = np.zeros((g, n_points, 2), np.float32)
    gt = np.zeros((g, n_ins_max, s4, s4), bool)
    gt_valid = np.zeros((g, n_ins_max), bool)
    cat_valid = np.zeros((g,), bool)

    from no_time_to_train_tpu.ops.resize import _resize_matrix_np
    wh = _resize_matrix_np(s, s4, "bilinear", True).astype(np.float32)

    for bi, idx in enumerate(idxs):
        item = ds[idx]
        cats = list(item["refs_by_cat"].keys())[:n_cat_max]
        for ci, cat in enumerate(cats):
            gslot = bi * n_cat_max + ci
            tar[gslot] = item["target_img"]
            r = item["refs_by_cat"][cat]
            n = min(n_refs, len(r["imgs"]))
            refs[gslot, :n] = r["imgs"][:n]
            rmask[gslot, :n] = r["masks"][:n]
            anns = item["tar_anns_by_cat"][cat]
            pts = anns["query_points"][:n_points]
            qpts[gslot, :len(pts)] = pts
            masks = anns["masks"][:n_ins_max]
            for mi, m in enumerate(masks):
                lr = wh @ m @ wh.T
                gt[gslot, mi] = lr > 0
                gt_valid[gslot, mi] = True
            cat_valid[gslot] = True
    return dict(tar_imgs=jnp.asarray(tar), ref_imgs=jnp.asarray(refs),
                ref_masks=jnp.asarray(rmask), query_points=jnp.asarray(qpts),
                gt_masks=jnp.asarray(gt), gt_valid=jnp.asarray(gt_valid),
                cat_valid=jnp.asarray(cat_valid))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--json-file", required=True)
    p.add_argument("--sam2-cfg", default="sam2_hiera_l.yaml")
    p.add_argument("--sam2-ckpt", default=None)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--base-lr", type=float, default=1e-4)
    p.add_argument("--warmup-iters", type=int, default=250)
    p.add_argument("--n-points", type=int, default=8)
    p.add_argument("--out", default="work_dirs/sam2ref_head.pkl")
    a = p.parse_args()

    import dataclasses
    cfg = SAM2_PRESETS[a.sam2_cfg]
    if a.image_size:
        cfg = dataclasses.replace(cfg, image_size=a.image_size)
    model = SAM2(cfg)
    params = (load_sam2_torch_checkpoint(a.sam2_ckpt, cfg)
              if a.sam2_ckpt else None)
    if params is None:
        from no_time_to_train_tpu.models.matching.pipeline import (
            _random_params_like)
        import jax
        import jax.numpy as jnp
        params = _random_params_like(
            lambda k: model.init(k, jnp.zeros((1, cfg.image_size,
                                               cfg.image_size, 3)),
                                 method=model.init_everything),
            jax.random.PRNGKey(0), 0)
    ref = SAM2Ref(model, params, Sam2RefConfig())

    ds = COCORefTrainDataset(a.root, a.json_file, cfg.image_size,
                             n_pos_points=a.n_points // 2, neg_ratio=1.0)
    opt = ref.make_optimizer(base_lr=a.base_lr, warmup_iters=a.warmup_iters,
                             decay_steps=(int(a.steps * 0.8),),
                             train_bs=a.batch_size)
    opt_state = opt.init(ref.head_params)
    step_fn = ref.make_train_step(opt)

    head = ref.head_params
    rng = np.random.default_rng(0)
    for step in range(a.steps):
        idxs = rng.integers(0, len(ds), a.batch_size)
        batch = make_batch(ds, idxs, n_cat_max=1, n_refs=1,
                           n_points=a.n_points, n_ins_max=8,
                           image_size=cfg.image_size)
        head, opt_state, loss, metrics = step_fn(head, opt_state, batch)
        if step % 20 == 0:
            print(f"step {step}: iou_loss {float(loss):.4f} "
                  f"mean_seg_iou {float(metrics['mean_seg_iou']):.4f}")

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    import jax
    with open(a.out, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, head), f)
    print(f"trained head -> {a.out}")


if __name__ == "__main__":
    main()
