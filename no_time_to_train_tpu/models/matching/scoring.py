"""Matching math: cosine similarity vs class prototypes, negative-reference
suppression, and semantic intersection-over-self score decay.

Ports of reference matching_baseline_utils.py:869-941 (:831-867 for IoS) with
padded static shapes + validity masks: all reductions are single MXU matmuls.
The per-class python loop of compute_semantic_ios collapses into one masked
pairwise computation (masks of different classes never interact in the
reference loop, so a same-class pair mask is exactly equivalent).
"""
import jax.numpy as jnp

__all__ = ["masked_avg_feats", "sim_global_avg", "sim_global_avg_with_neg",
           "semantic_ios"]


def masked_avg_feats(tar_feat, masks_bool, valid=None):
    """tar_feat [P, D]; masks_bool [M, P] -> L2-normalized pooled feats [M, D].
    Zero-area masks divide by 1 (reference :887-889). The [M, P] x [P, D]
    pooling matmul runs in tar_feat's dtype with fp32 accumulation (0/1 mask
    operand is exact in bf16; averages/norms computed in fp32)."""
    masks = masks_bool.astype(tar_feat.dtype)
    msum = masks.sum(axis=-1, keepdims=True, dtype=jnp.float32)
    msum = jnp.where(msum == 0, 1.0, msum)
    pooled = jnp.dot(masks, tar_feat, preferred_element_type=jnp.float32)
    avg = pooled / msum
    norm = jnp.maximum(jnp.linalg.norm(avg, axis=-1, keepdims=True), 1e-12)
    return avg / norm


def sim_global_avg(tar_feat, masks_bool, mem_feats_ins_avg):
    """Cosine of masked-avg target feats vs per-class prototype (mean of
    instance prototypes). Returns (sim [M, C], obj_feats [M, D])."""
    obj_feats = masked_avg_feats(tar_feat, masks_bool)
    mem_avg = mem_feats_ins_avg.mean(axis=1)
    mem_avg = mem_avg / jnp.maximum(
        jnp.linalg.norm(mem_avg, axis=-1, keepdims=True), 1e-12)
    sim = obj_feats @ mem_avg.T
    return sim, obj_feats


def sim_global_avg_with_neg(tar_feat, masks_bool, mem_feats_avg,
                            mem_feats_ins_avg_neg, sigma=1.0):
    """Positive sim with exponential negative-reference suppression
    (reference :906-941): sim_pos * exp(-max(sim_neg - sim_pos, 0) / sigma)."""
    obj_feats = masked_avg_feats(tar_feat, masks_bool)
    mem_avg = mem_feats_avg / jnp.maximum(
        jnp.linalg.norm(mem_feats_avg, axis=-1, keepdims=True), 1e-12)
    n_classes = mem_feats_avg.shape[0]
    c = tar_feat.shape[-1]
    neg = mem_feats_ins_avg_neg / jnp.maximum(
        jnp.linalg.norm(mem_feats_ins_avg_neg, axis=-1, keepdims=True), 1e-12)
    neg = neg.reshape(-1, c)

    sim_pos = jnp.clip(obj_feats @ mem_avg.T, 0.0)
    sim_neg = jnp.clip(obj_feats @ neg.T, 0.0)
    sim_neg = sim_neg.reshape(masks_bool.shape[0], n_classes, -1).max(axis=-1)
    out = sim_pos * jnp.exp(-jnp.clip(sim_neg - sim_pos, 0.0) / sigma)
    return out, obj_feats


def semantic_ios(masks_bool, labels, obj_sim, valid=None, use_semantic=True,
                 rank_score=True):
    """Per-mask max over same-class others of
    (intersection * obj_sim [rank_score]) / own_area * obj_sim [use_semantic].

    masks_bool [M, P]; labels [M]; obj_sim [M, M]; valid [M] bool. Matches the
    reference per-class loop exactly (invalid masks contribute nothing)."""
    masks = masks_bool.astype(jnp.bfloat16)  # 0/1 exact; fp32 accumulation
    if valid is not None:
        masks = masks * valid[:, None].astype(masks.dtype)
    pos_num = masks.sum(axis=-1, dtype=jnp.float32)
    inter = jnp.dot(masks, masks.T, preferred_element_type=jnp.float32)
    m = masks.shape[0]
    same = (labels[:, None] == labels[None, :]) & ~jnp.eye(m, dtype=bool)
    if valid is not None:
        same = same & valid[:, None] & valid[None, :]
    inter = jnp.where(same, inter, 0.0)
    if rank_score:
        inter = inter * obj_sim
    ios = inter / jnp.maximum(pos_num[:, None], 1.0)
    if use_semantic:
        ios = ios * obj_sim
    ios = jnp.where(same, ios, 0.0)
    return ios.max(axis=-1)
