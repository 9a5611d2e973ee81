"""Automatic mask generator (reference sam2/automatic_mask_generator.py,
TPU re-design).

The reference runs a python loop of 64-point microbatches with host-side
MaskData filtering after each batch (:294-386). Here the entire grid decodes
in ONE jitted program (chunked internally by lax.map) and all filters run on
device with validity masks: predicted-IoU threshold, stability score, box NMS.
Crops (crop_n_layers>0) loop host-side with per-crop device decode and a final
cross-crop NMS, matching the reference flow (:224-293).
"""
import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.ops.resize import resize, resize_hw
from no_time_to_train_tpu.ops.masks import batched_mask_to_box, stability_score
from no_time_to_train_tpu.ops.nms import batched_nms
from no_time_to_train_tpu.data import rle as rle_mod


def build_point_grid(n_per_side):
    """amg.py:181 — normalized [0,1] grid of pixel centers."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def build_all_layer_point_grids(n_per_side, n_layers, scale_per_layer):
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size, n_layers, overlap_ratio):
    """amg.py:202 — crop boxes XYWH... returned as XYXY + layer indices."""
    crop_boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(np.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        crop_box_x0 = [int((crop_w - overlap) * i)
                       for i in range(n_crops_per_side)]
        crop_box_y0 = [int((crop_h - overlap) * i)
                       for i in range(n_crops_per_side)]
        for x0 in crop_box_x0:
            for y0 in crop_box_y0:
                crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                                   min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


class SAM2AutomaticMaskGenerator:
    def __init__(self, model: SAM2, params, points_per_side=32,
                 points_per_batch=256, pred_iou_thresh=0.8,
                 stability_score_thresh=0.95, stability_score_offset=1.0,
                 mask_threshold=0.0, box_nms_thresh=0.7, crop_n_layers=0,
                 crop_nms_thresh=0.7, crop_overlap_ratio=512 / 1500,
                 crop_n_points_downscale_factor=1, min_mask_region_area=0,
                 output_mode="binary_mask", multimask_output=True,
                 use_m2m=False, **kwargs):
        self.model = model
        self.params = params
        self.point_grids = build_all_layer_point_grids(
            points_per_side, crop_n_layers, crop_n_points_downscale_factor)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self.multimask_output = multimask_output
        self.use_m2m = use_m2m
        self._jit_decode = jax.jit(self._decode_impl,
                                   static_argnames=("n_points",))

    def _decode_impl(self, params, img, points01, n_points):
        """img: [H, W, 3] in [0,1] (a crop, any size -> resized to model res);
        points01: [P, 2] normalized. Returns per-candidate (lr_logits, iou,
        stability, box, keep)."""
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        c = self.model.cfg
        s = c.image_size
        x = resize(img[None], (s, s), mode="bilinear")
        out = self.model.apply({"params": params}, _normalize(x),
                               method=self.model.forward_image)
        fpn = out["backbone_fpn"]
        feats, hr = fpn[-1], [fpn[0], fpn[1]]

        pts = points01 * s
        chunk = min(self.points_per_batch, n_points)
        n_chunks = -(-n_points // chunk)
        pad = n_chunks * chunk - n_points
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        pts_chunks = pts.reshape(n_chunks, chunk, 1, 2)

        def decode_chunk(pc):
            labels = jnp.ones((chunk, 1), jnp.int32)
            masks, ious, _, _ = self.model.apply(
                {"params": params}, feats, pc, labels, None, hr,
                self.multimask_output, True,
                method=self.model.forward_sam_heads)
            return masks.astype(jnp.float32), ious

        masks4, ious4 = jax.lax.map(decode_chunk, pts_chunks)
        m = 3 if self.multimask_output else 4  # channels kept (all-masks out)
        if self.multimask_output:
            masks = masks4[..., 1:, :, :].reshape(-1, *masks4.shape[-2:])
            ious = ious4[..., 1:].reshape(-1)
        else:
            masks = masks4[..., 0:1, :, :].reshape(-1, *masks4.shape[-2:])
            ious = ious4[..., 0:1].reshape(-1)
        n_cand = masks.shape[0]
        valid = (jnp.arange(n_cand) // m) < n_points

        if self.use_m2m:
            # one refinement step: re-prompt each candidate with its point +
            # its low-res mask, single-mask output (reference
            # automatic_mask_generator.py:330-351, refine_with_m2m :437-454);
            # the iou/stability filters below then act on the refined masks
            pts_cand = jnp.repeat(pts.reshape(-1, 2), m, axis=0)
            n_rchunks = n_cand // chunk
            r_pts = pts_cand.reshape(n_rchunks, chunk, 1, 2)
            r_lr = masks.reshape(n_rchunks, chunk, *masks.shape[-2:])

            def refine_chunk(args):
                pc, lr = args
                labels = jnp.ones((chunk, 1), jnp.int32)
                rm, ri, _, _ = self.model.apply(
                    {"params": params}, feats, pc, labels, lr[..., None],
                    hr, False, True, method=self.model.forward_sam_heads)
                return rm[:, 0].astype(jnp.float32), ri[:, 0]

            masks, ious = jax.lax.map(refine_chunk, (r_pts, r_lr))
            masks = masks.reshape(n_cand, *masks.shape[-2:])
            ious = ious.reshape(-1)

        keep = valid
        if self.pred_iou_thresh > 0:
            keep &= ious > self.pred_iou_thresh
        stab = stability_score(masks, self.mask_threshold,
                               self.stability_score_offset)
        if self.stability_score_thresh > 0:
            keep &= stab >= self.stability_score_thresh

        bin_masks = masks > self.mask_threshold
        boxes = batched_mask_to_box(bin_masks).astype(jnp.float32)
        order, nms_keep = batched_nms(boxes, ious,
                                      jnp.zeros(n_cand, jnp.int32), keep,
                                      self.box_nms_thresh)
        final_keep = jnp.zeros(n_cand, bool).at[order].set(nms_keep)
        return masks, ious, stab, boxes, final_keep

    def generate(self, image):
        """image: [H, W, 3] float [0,1] numpy. Returns list of record dicts
        (segmentation, area, bbox XYWH, predicted_iou, point_coords,
        stability_score, crop_box) like the reference."""
        oh, ow = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            (oh, ow), self.crop_n_layers, self.crop_overlap_ratio)

        all_recs = []
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            x0, y0, x1, y1 = crop_box
            crop = image[y0:y1, x0:x1]
            ch, cw = crop.shape[:2]
            pts01 = self.point_grids[layer_idx]
            n_pts = len(pts01)
            masks, ious, stab, boxes, keep = self._jit_decode(
                self.params, jnp.asarray(crop), jnp.asarray(pts01, jnp.float32),
                n_points=n_pts)
            keep_np = np.asarray(keep)
            idxs = np.nonzero(keep_np)[0]
            if len(idxs) == 0:
                continue
            ious_np = np.asarray(ious)[idxs]
            stab_np = np.asarray(stab)[idxs]
            s = self.model.cfg.image_size
            m = 3 if self.multimask_output else 1
            pts_img = np.asarray(pts01)[(idxs // m) % n_pts]
            # upscale + threshold ON DEVICE in chunks, fetch packed bools:
            # the previous per-mask loop re-uploaded each low-res mask and
            # fetched a full-res f32 mask per candidate (~K round trips +
            # 4 MB f32 each through the remote-TPU tunnel); this is K/64
            # dispatch chains and 1-byte pixels
            seg_chunks = []
            for c0 in range(0, len(idxs), 64):
                sub = jnp.asarray(idxs[c0:c0 + 64])
                seg = resize_hw(masks[sub], (ch, cw),
                                mode="bilinear") > self.mask_threshold
                seg_chunks.append(np.asarray(seg))
            seg_all = np.concatenate(seg_chunks)
            for j in range(len(idxs)):
                seg = seg_all[j]
                full = np.zeros((oh, ow), bool)
                full[y0:y1, x0:x1] = seg
                ys, xs = np.nonzero(full)
                if len(ys) == 0:
                    continue
                bbox = [int(xs.min()), int(ys.min()),
                        int(xs.max() - xs.min()), int(ys.max() - ys.min())]
                rec = {
                    "segmentation": full if self.output_mode == "binary_mask"
                    else rle_mod.encode_mask(full),
                    "area": int(full.sum()),
                    "bbox": bbox,
                    "predicted_iou": float(ious_np[j]),
                    "point_coords": [(pts_img[j] * [cw, ch]
                                      + [x0, y0]).tolist()],
                    "stability_score": float(stab_np[j]),
                    "crop_box": list(crop_box),
                }
                all_recs.append(rec)

        if self.min_mask_region_area > 0:
            all_recs = self.postprocess_small_regions(all_recs)

        # cross-crop NMS (reference :243-249)
        if len(crop_boxes) > 1 and all_recs:
            boxes = np.array([[r["bbox"][0], r["bbox"][1],
                               r["bbox"][0] + r["bbox"][2],
                               r["bbox"][1] + r["bbox"][3]]
                              for r in all_recs], np.float32)
            scores = np.array([1.0 / max(1e-6, np.prod(r["crop_box"][2:]))
                               for r in all_recs], np.float32)
            order, keep = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                      jnp.zeros(len(all_recs), jnp.int32),
                                      jnp.ones(len(all_recs), bool),
                                      self.crop_nms_thresh)
            kept = {int(o) for o, k in zip(np.asarray(order), np.asarray(keep))
                    if k}
            all_recs = [r for i, r in enumerate(all_recs) if i in kept]
        return all_recs

    def postprocess_small_regions(self, recs):
        """Remove sprinkles and fill holes below min_mask_region_area using
        the XLA connected-components op (reference
        amg.py:remove_small_regions + postprocess_small_regions :387-436,
        which uses cv2 CCL)."""
        from no_time_to_train_tpu.ops.connected_components import (
            connected_components)
        out = []
        for r in recs:
            seg = r["segmentation"]
            binary = seg if isinstance(seg, np.ndarray) else None
            if binary is None:
                binary = rle_mod.decode_rle(seg).astype(bool)
            m = jnp.asarray(binary)
            # remove small foreground sprinkles
            labels, areas = connected_components(m)
            m = m & ~((labels > 0) & (areas <= self.min_mask_region_area))
            # fill small background holes
            labels, areas = connected_components(~m)
            m = m | ((labels > 0) & (areas <= self.min_mask_region_area))
            binary = np.asarray(m)
            if not binary.any():
                continue
            ys, xs = np.nonzero(binary)
            r = dict(r)
            r["segmentation"] = (binary if isinstance(seg, np.ndarray)
                                 else rle_mod.encode_mask(binary))
            r["area"] = int(binary.sum())
            r["bbox"] = [int(xs.min()), int(ys.min()),
                         int(xs.max() - xs.min()), int(ys.max() - ys.min())]
            out.append(r)
        return out
