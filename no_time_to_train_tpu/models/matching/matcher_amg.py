"""Matcher-flavored automatic mask generator (reference
no_time_to_train/models/matcher_utils.py:62-309, TPU re-design).

The reference subclass `SAM2AutomaticMaskGenerator_Matcher` extends AMG with
three generation modes:

  - *select* mode: instead of a dense grid, decode caller-chosen point
    prompts (list of coord/label arrays, each point its own prompt), with an
    optional shared box prompt (matcher_utils.py:146-180);
  - *dense_pred* mode: the dense grid WITHOUT the final NMS — the raw,
    filter-surviving candidate set is returned for downstream matching
    (matcher_utils.py:135-140, early return before the NMS at :183-189);
  - `extra_mask_data`: candidates from a previous pass concatenated before
    the NMS so re-prompting competes with prior detections (:184-185).

The torch version loops 64-point host microbatches with MaskData filtering
per batch; here each prompt list is padded to a static chunk multiple and
decoded in ONE jitted program (lax.map over chunks) with all filters running
on device as validity masks. The shared box rides along as two extra points
with corner labels 2/3 per prompt — numerically identical to the prompt
encoder's box path (prompt_encoder.py:_embed_boxes) but keeps the decode
shape static regardless of whether a box is present.

`kmeans_pp` (matcher_utils.py:30-57) lives in
no_time_to_train_tpu/models/matching/memory_bank.py (kmeans_pp_init +
kmeans_decouple).
"""
import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.models.sam2.amg import SAM2AutomaticMaskGenerator
from no_time_to_train_tpu.ops.resize import resize, resize_hw
from no_time_to_train_tpu.ops.masks import batched_mask_to_box, stability_score
from no_time_to_train_tpu.ops.nms import batched_nms


class SAM2AutomaticMaskGeneratorMatcher(SAM2AutomaticMaskGenerator):
    """AMG with caller-selected prompts + dense_pred + extra_mask_data."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._jit_select = jax.jit(
            self._decode_select_impl,
            static_argnames=("n_prompts", "has_box"))

    # ------------------------------------------------------------- select
    def _decode_select_impl(self, params, img, pts, labels, box,
                            n_prompts, has_box):
        """img [H, W, 3] in [0,1]; pts [P, n, 2] model-res pixel coords
        (P padded to a chunk multiple); labels [P, n] int32; box [4]
        model-res XYXY (ignored unless has_box). Returns per-candidate
        (lr_logits [K, 4h, 4w], iou [K], stability [K], boxes [K, 4],
        valid [K]) with K = P * n_mask_channels."""
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        c = self.model.cfg
        s = c.image_size
        x = resize(img[None], (s, s), mode="bilinear")
        out = self.model.apply({"params": params}, _normalize(x),
                               method=self.model.forward_image)
        fpn = out["backbone_fpn"]
        feats, hr = fpn[-1], [fpn[0], fpn[1]]

        p_total = pts.shape[0]
        if has_box:
            # box corners as labels 2/3, appended after the points — the
            # exact embedding order of the reference's points+boxes prompt
            # (sam/prompt_encoder forward: point embeds then box embeds)
            corners = box.reshape(1, 2, 2)
            pts = jnp.concatenate(
                [pts, jnp.broadcast_to(corners, (p_total, 2, 2))], axis=1)
            labels = jnp.concatenate(
                [labels, jnp.broadcast_to(jnp.asarray([[2, 3]], jnp.int32),
                                          (p_total, 2))], axis=1)

        chunk = min(self.points_per_batch, p_total)
        n_chunks = p_total // chunk
        pts_c = pts.reshape(n_chunks, chunk, pts.shape[1], 2)
        lab_c = labels.reshape(n_chunks, chunk, labels.shape[1])

        def decode_chunk(args):
            pc, lc = args
            masks, ious, _, _ = self.model.apply(
                {"params": params}, feats, pc, lc, None, hr,
                self.multimask_output, True,
                method=self.model.forward_sam_heads)
            return masks.astype(jnp.float32), ious

        masks4, ious4 = jax.lax.map(decode_chunk, (pts_c, lab_c))
        m = 3 if self.multimask_output else 1
        if self.multimask_output:
            masks = masks4[..., 1:, :, :].reshape(-1, *masks4.shape[-2:])
            ious = ious4[..., 1:].reshape(-1)
        else:
            masks = masks4[..., 0:1, :, :].reshape(-1, *masks4.shape[-2:])
            ious = ious4[..., 0:1].reshape(-1)
        n_cand = masks.shape[0]
        valid = (jnp.arange(n_cand) // m) < n_prompts

        keep = valid
        if self.pred_iou_thresh > 0:
            keep &= ious > self.pred_iou_thresh
        stab = stability_score(masks, self.mask_threshold,
                               self.stability_score_offset)
        if self.stability_score_thresh > 0:
            keep &= stab >= self.stability_score_thresh
        boxes = batched_mask_to_box(masks > self.mask_threshold)
        return masks, ious, stab, boxes.astype(jnp.float32), keep

    # ------------------------------------------------------------ generate
    def generate(self, image, select_point_coords=None,
                 select_point_labels=None, select_box=None,
                 select_mask_input=None, dense_pred=False,
                 extra_mask_data=None):
        """matcher_utils.py:63-84. In select mode returns (masks, ious) with
        masks binarized at the original image size; in dense_pred mode
        returns the pre-NMS candidate dict. `select_mask_input` is
        unimplemented, as in the reference (:233-234)."""
        if select_mask_input is not None:
            raise NotImplementedError
        if dense_pred:
            assert extra_mask_data is None
            return self._generate_dense(image)

        assert select_point_coords is not None
        assert select_point_labels is not None
        oh, ow = image.shape[:2]
        s = self.model.cfg.image_size
        scale = np.asarray([s / ow, s / oh], np.float32)

        pts = np.concatenate([np.asarray(p, np.float32).reshape(-1, 1, 2)
                              for p in select_point_coords], axis=0) * scale
        labels = np.concatenate([np.asarray(l).reshape(-1, 1)
                                 for l in select_point_labels],
                                axis=0).astype(np.int32)
        n_prompts = pts.shape[0]
        chunk = min(self.points_per_batch, max(n_prompts, 1))
        pad = (-n_prompts) % chunk
        pts = np.pad(pts, ((0, pad), (0, 0), (0, 0)))
        labels = np.pad(labels, ((0, pad), (0, 0)))

        if select_box is not None:
            box = np.asarray(select_box, np.float32).reshape(4)
            box = box * np.concatenate([scale, scale])
            has_box = True
        else:
            box = np.zeros(4, np.float32)
            has_box = False

        masks, ious, stab, boxes, keep = self._jit_select(
            self.params, jnp.asarray(image), jnp.asarray(pts),
            jnp.asarray(labels), jnp.asarray(box),
            n_prompts=n_prompts, has_box=has_box)

        boxes_np = np.asarray(boxes)
        ious_np = np.asarray(ious)
        keep_np = np.asarray(keep)
        if extra_mask_data is not None:
            # prior candidates compete in the same NMS (reference :184-185);
            # their boxes arrive at original-image scale — rescale to the
            # low-res frame this pass scores in
            ex_boxes = np.asarray(extra_mask_data["boxes"], np.float32)
            lr = masks.shape[-1]
            ex_scale = np.asarray([lr / ow, lr / oh, lr / ow, lr / oh],
                                  np.float32)
            boxes_np = np.concatenate([boxes_np, ex_boxes * ex_scale], axis=0)
            ious_np = np.concatenate(
                [ious_np, np.asarray(extra_mask_data["iou_preds"],
                                     np.float32)], axis=0)
            keep_np = np.concatenate(
                [keep_np, np.ones(len(ex_boxes), bool)], axis=0)

        order, nms_keep = batched_nms(
            jnp.asarray(boxes_np), jnp.asarray(ious_np),
            jnp.zeros(len(boxes_np), jnp.int32), jnp.asarray(keep_np),
            self.box_nms_thresh)
        final = np.zeros(len(boxes_np), bool)
        final[np.asarray(order)] = np.asarray(nms_keep)

        n_own = len(np.asarray(keep))
        kept_own = np.nonzero(final[:n_own])[0]
        out_masks, out_ious = [], []
        for j in kept_own:
            up = np.asarray(resize_hw(masks[int(j)], (oh, ow),
                                      mode="bilinear"))
            out_masks.append(up > self.mask_threshold)
            out_ious.append(float(ious_np[j]))
        if extra_mask_data is not None:
            kept_ex = np.nonzero(final[n_own:])[0]
            ex_masks = np.asarray(extra_mask_data["masks"])
            for j in kept_ex:
                out_masks.append(np.asarray(ex_masks[j], bool))
                out_ious.append(float(ious_np[n_own + j]))
        masks_out = (np.stack(out_masks) if out_masks
                     else np.zeros((0, oh, ow), bool))
        return masks_out, np.asarray(out_ious, np.float32)

    # --------------------------------------------------------------- dense
    def _generate_dense(self, image):
        """Dense grid, filters applied, NO NMS (matcher_utils.py:135-140).
        Returns a MaskData-like dict of the surviving candidates."""
        oh, ow = image.shape[:2]
        pts01 = self.point_grids[0]
        n_pts = len(pts01)
        masks, ious, stab, boxes, _ = self._jit_decode(
            self.params, jnp.asarray(image),
            jnp.asarray(pts01, np.float32), n_points=n_pts)
        # _jit_decode's final keep includes its NMS; reapply only the
        # pre-NMS filters here
        m = 3 if self.multimask_output else 1
        n_cand = masks.shape[0]
        keep = (np.arange(n_cand) // m) < n_pts
        ious_np = np.asarray(ious)
        stab_np = np.asarray(stab)
        if self.pred_iou_thresh > 0:
            keep &= ious_np > self.pred_iou_thresh
        if self.stability_score_thresh > 0:
            keep &= stab_np >= self.stability_score_thresh
        idxs = np.nonzero(keep)[0]
        out_masks = []
        for j in idxs:
            up = np.asarray(resize_hw(masks[int(j)], (oh, ow),
                                      mode="bilinear"))
            out_masks.append(up > self.mask_threshold)
        lr = masks.shape[-1]
        box_scale = np.asarray([ow / lr, oh / lr, ow / lr, oh / lr],
                               np.float32)
        return {
            "masks": (np.stack(out_masks) if out_masks
                      else np.zeros((0, oh, ow), bool)),
            "iou_preds": ious_np[idxs],
            "stability_score": stab_np[idxs],
            "boxes": np.asarray(boxes)[idxs] * box_scale,
            "points": np.asarray(pts01)[(idxs // m) % n_pts]
            * np.asarray([ow, oh], np.float32),
        }
