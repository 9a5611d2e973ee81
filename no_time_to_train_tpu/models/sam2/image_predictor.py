"""Single-image predictor (reference sam2/sam2_image_predictor.py).

set_image computes backbone features once; predict() runs the prompt encoder
and mask decoder for point/box/mask prompts — batched over prompts in one jit.
Logits are clamped to ±32 before resize like the reference (:434).
"""
import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.ops.resize import resize, resize_hw
from no_time_to_train_tpu.ops.connected_components import postprocess_masks_cc


class SAM2ImagePredictor:
    def __init__(self, model: SAM2, params, mask_threshold=0.0,
                 max_hole_area=0.0, max_sprinkle_area=0.0):
        self.model = model
        self.params = params
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area
        self._features = None
        self._orig_hw = None
        self._jit_features = jax.jit(self._features_impl)
        self._jit_predict = jax.jit(self._predict_impl,
                                    static_argnames=("multimask_output",
                                                     "with_points",
                                                     "with_boxes"))

    def _features_impl(self, params, img):
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        s = self.model.cfg.image_size
        x = resize(img[None], (s, s), mode="bilinear")
        x = _normalize(x)
        out = self.model.apply({"params": params}, x,
                               method=self.model.forward_image)
        return out["backbone_fpn"]

    def set_image(self, image):
        """image: [H, W, 3] float in [0,1] (any size; resized to model res)."""
        self._orig_hw = image.shape[:2]
        self._features = self._jit_features(self.params, jnp.asarray(image))

    def _predict_impl(self, params, fpn, coords, labels, boxes, mask_input,
                      multimask_output, with_points, with_boxes):
        feats = fpn[-1]
        hr = [fpn[0], fpn[1]] \
            if self.model.cfg.use_high_res_features_in_sam else None

        def run(m):
            sparse, dense = m.sam_prompt_encoder(
                points=(coords, labels) if with_points else None,
                boxes=boxes if with_boxes else None,
                masks=mask_input)
            return m.sam_mask_decoder(
                image_embeddings=feats,
                image_pe=m.sam_prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=multimask_output, repeat_image=False,
                high_res_features=hr)

        masks, ious, _, _ = self.model.apply({"params": params}, method=run)
        return masks.astype(jnp.float32), ious

    def predict(self, point_coords=None, point_labels=None, box=None,
                mask_input=None, multimask_output=True, return_logits=False):
        """Prompts in ORIGINAL image coordinates. Returns (masks [B, M, H, W],
        ious [B, M], low_res [B, M, 256, 256]) as numpy."""
        assert self._features is not None, "call set_image first"
        s = self.model.cfg.image_size
        oh, ow = self._orig_hw
        coords = labels = boxes = None
        if point_coords is not None:
            coords = np.asarray(point_coords, np.float32).reshape(-1, 2)
            coords = coords * [s / ow, s / oh]
            coords = jnp.asarray(coords)[None] if coords.ndim == 2 else coords
            labels = jnp.asarray(np.asarray(point_labels,
                                            np.int32).reshape(1, -1))
        if box is not None:
            b = np.asarray(box, np.float32).reshape(-1, 4)
            b = b * [s / ow, s / oh, s / ow, s / oh]
            boxes = jnp.asarray(b)
        mi = None
        if mask_input is not None:
            mi = jnp.asarray(mask_input, jnp.float32)[..., None]
            if mi.ndim == 3:
                mi = mi[None]
        lr, ious = self._jit_predict(
            self.params, self._features, coords, labels, boxes, mi,
            multimask_output=multimask_output,
            with_points=point_coords is not None,
            with_boxes=box is not None)
        lr = jnp.clip(lr, -32.0, 32.0)
        if self.max_hole_area > 0 or self.max_sprinkle_area > 0:
            lr = postprocess_masks_cc(lr, self.mask_threshold,
                                      self.max_hole_area,
                                      self.max_sprinkle_area)
        hi = resize_hw(lr, (oh, ow), mode="bilinear")
        if not return_logits:
            hi = hi > self.mask_threshold
        return np.asarray(hi), np.asarray(ious), np.asarray(lr)
