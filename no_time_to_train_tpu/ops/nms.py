"""Class-aware box NMS with static shapes (replaces torchvision
batched_nms used at reference Sam2MatchingBaseline_noAMG.py:624).

Semantics match torchvision: process candidates in decreasing score order,
suppress later boxes of the same class with IoU strictly greater than the
threshold. Invalid (padding) entries never suppress anything and are never
kept. Returns the score-sorted candidate order plus a keep flag per sorted
position, so callers can take "first K kept" with static shapes.
"""
import jax
import jax.numpy as jnp

__all__ = ["box_iou", "batched_nms"]


def box_iou(boxes_a, boxes_b):
    """IoU between [N, 4] and [M, 4] XYXY boxes (torchvision convention:
    area = (x2-x1)*(y2-y1), no +1)."""
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((boxes_a[:, 2] - boxes_a[:, 0])
              * (boxes_a[:, 3] - boxes_a[:, 1]))[:, None]
    area_b = ((boxes_b[:, 2] - boxes_b[:, 0])
              * (boxes_b[:, 3] - boxes_b[:, 1]))[None, :]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def batched_nms(boxes, scores, classes, valid, iou_threshold):
    """boxes [N,4] float, scores [N], classes [N] int, valid [N] bool.

    Returns (order [N] int32, keep [N] bool): `order` is candidate indices
    sorted by decreasing score (invalid last); keep[i] says whether candidate
    order[i] survives NMS. N is static; cost is one [N,N] IoU matrix plus an
    O(N) sequential suppression scan (tiny next to the decode itself).
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    sort_scores = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-sort_scores, stable=True).astype(jnp.int32)

    b_sorted = boxes[order]
    c_sorted = classes[order]
    v_sorted = valid[order]

    iou = box_iou(b_sorted, b_sorted)
    same_class = c_sorted[:, None] == c_sorted[None, :]
    suppress_mat = (iou > iou_threshold) & same_class & v_sorted[None, :] \
        & v_sorted[:, None]

    # Blocked greedy suppression, EXACT w.r.t. the sequential algorithm:
    # within a block the dependency chain is unrolled (static, fuses into one
    # loop body); across blocks, kept rows suppress all later candidates in a
    # single matrix reduction. This turns n sequential while-iterations (the
    # profiled hot spot of the whole test step) into n/block.
    block = min(64, n)
    n_pad = -(-n // block) * block
    pad = n_pad - n
    sup_mat = jnp.pad(suppress_mat, ((0, pad), (0, pad)))
    arange_blk = jnp.arange(block)
    arange_n = jnp.arange(n_pad)

    def block_body(b, suppressed):
        start = b * block
        blk_sup = jax.lax.dynamic_slice(suppressed, (start,), (block,))
        sub = jax.lax.dynamic_slice(sup_mat, (start, start), (block, block))
        for i in range(block):  # unrolled: one fused body per block
            blk_sup = blk_sup | (sub[i] & ~blk_sup[i] & (arange_blk > i))
        suppressed = jax.lax.dynamic_update_slice(suppressed, blk_sup,
                                                  (start,))
        rows = jax.lax.dynamic_slice(sup_mat, (start, 0), (block, n_pad))
        later = jnp.any(rows & ~blk_sup[:, None], axis=0)
        return suppressed | (later & (arange_n >= start + block))

    init = jnp.pad(v_sorted & False, (0, pad), constant_values=True)
    n_blocks = n_pad // block
    if n_blocks <= 16:
        # unrolled: at flagship N (1024-2048 -> <= 16 blocks) the fori_loop's
        # per-iteration overhead (~50 us/iter profiled, while.4) dominates
        # its tiny body; unrolling lets XLA fuse/schedule the whole sweep
        suppressed = init
        for bi in range(n_blocks):
            suppressed = block_body(bi, suppressed)
        suppressed = suppressed[:n]
    else:
        suppressed = jax.lax.fori_loop(0, n_blocks, block_body, init)[:n]
    keep = (~suppressed) & v_sorted
    return order, keep


def take_first_kept(order, keep, k):
    """Indices of the first k kept candidates in score order, padded by
    repeating the last valid slot; plus validity flags. Static shapes."""
    n = order.shape[0]
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1  # rank among kept
    slot = jnp.where(keep & (rank < k), rank, n)  # scatter target (n = drop)
    src_pos = jnp.arange(n, dtype=jnp.int32)
    # scatter positions of kept candidates into their rank slots
    buf = jnp.full((n + 1,), -1, jnp.int32)
    buf = buf.at[slot].set(src_pos, mode="drop")
    sel_pos = buf[:k]
    valid_out = sel_pos >= 0
    sel_pos = jnp.where(valid_out, sel_pos, 0)
    return order[sel_pos], valid_out
