"""Mask utilities (reference sam2/utils/amg.py — pure-tensor rewrites,
static shapes, jit/vmap-safe)."""
import jax.numpy as jnp

__all__ = ["batched_mask_to_box", "stability_score", "mask_iou_matrix"]


def batched_mask_to_box(masks):
    """XYXY boxes around boolean masks [..., H, W] -> [..., 4]; empty masks
    give [0,0,0,0] (amg.py:305-347)."""
    h, w = masks.shape[-2], masks.shape[-1]
    masks = masks.astype(bool)
    in_height = masks.any(axis=-1)
    hc = in_height * jnp.arange(h)
    bottom = hc.max(axis=-1)
    top = (hc + h * (~in_height)).min(axis=-1)
    in_width = masks.any(axis=-2)
    wc = in_width * jnp.arange(w)
    right = wc.max(axis=-1)
    left = (wc + w * (~in_width)).min(axis=-1)
    empty = (right < left) | (bottom < top)
    box = jnp.stack([left, top, right, bottom], axis=-1)
    return box * (~empty)[..., None]


def stability_score(mask_logits, mask_threshold=0.0, threshold_offset=1.0):
    """IoU between high/low thresholded masks (amg.py:158-178)."""
    inter = (mask_logits > (mask_threshold + threshold_offset)).sum((-1, -2))
    union = (mask_logits > (mask_threshold - threshold_offset)).sum((-1, -2))
    return inter.astype(jnp.float32) / union.astype(jnp.float32)


def mask_iou_matrix(masks_a, masks_b):
    """Pairwise mask IoU between [N, H, W] and [M, H, W] boolean stacks via one
    MXU matmul (used by eval utilities)."""
    a = masks_a.reshape(masks_a.shape[0], -1).astype(jnp.float32)
    b = masks_b.reshape(masks_b.shape[0], -1).astype(jnp.float32)
    inter = a @ b.T
    area_a = a.sum(-1, keepdims=True)
    area_b = b.sum(-1, keepdims=True)
    union = area_a + area_b.T - inter
    return jnp.where(union > 0, inter / union, 0.0)
