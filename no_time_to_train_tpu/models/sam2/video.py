"""SAM2 video predictor (reference sam2/sam2_video_predictor.py, TPU design).

Host-side orchestration (per-frame python control flow: conditioning-frame
selection, ring-buffer management) around fixed-shape jitted device steps:

  - `_features`: Hiera+FPN for one frame (1-frame cache like the reference's
    :801-833 LRU).
  - `_cond_step`: prompted frame, no-memory path (directly_add_no_mem_embed).
  - `_track_step`: memory attention over a FIXED layout memory bank —
    [num_maskmem spatial slots | max_obj_ptrs ptr-token slots] with validity
    masks (padded slots are masked in cross-attention, so the math matches the
    reference's dynamic-length concatenation, sam2_base.py:539-716).
  - `_encode_mem`: memory encoder on predicted masks (binarize-from-points per
    the video-predictor override).

Objects are batched along the leading axis of every step (the reference loops
objects in python; here one jit call serves all objects in a frame).
"""
from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.models.sam2.model import SAM2, NO_OBJ_SCORE


def apply_non_overlapping_constraints(pred_masks):
    """Keep only the highest-scoring object per pixel; suppress others to
    <= -10 (reference sam2_base.py:869-887). pred_masks: [B, H, W]."""
    if pred_masks.shape[0] == 1:
        return pred_masks
    max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
    batch_obj = jnp.arange(pred_masks.shape[0])[:, None, None]
    keep = max_obj == batch_obj
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, max=-10.0))
from no_time_to_train_tpu.ops.resize import resize, resize_hw
from no_time_to_train_tpu.ops.connected_components import fill_holes_in_mask_scores


def select_closest_cond_frames(frame_idx, cond_frame_outputs, max_cond_frame_num):
    """Reference sam2_utils.select_closest_cond_frames (:15-57)."""
    if max_cond_frame_num == -1 or len(cond_frame_outputs) <= max_cond_frame_num:
        return dict(cond_frame_outputs), {}
    assert max_cond_frame_num >= 2
    selected = {}
    idx_before = max((t for t in cond_frame_outputs if t < frame_idx),
                     default=None)
    if idx_before is not None:
        selected[idx_before] = cond_frame_outputs[idx_before]
    idx_after = min((t for t in cond_frame_outputs if t >= frame_idx),
                    default=None)
    if idx_after is not None:
        selected[idx_after] = cond_frame_outputs[idx_after]
    remain = sorted((t for t in cond_frame_outputs if t not in selected),
                    key=lambda x: abs(x - frame_idx))
    for t in remain[: max_cond_frame_num - len(selected)]:
        selected[t] = cond_frame_outputs[t]
    unselected = {t: v for t, v in cond_frame_outputs.items()
                  if t not in selected}
    return selected, unselected


class SAM2VideoPredictor:
    def __init__(self, model: SAM2, params):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        c = self.cfg
        self._feat_hw = c.sam_image_embedding_size
        self._n_feat = self._feat_hw * self._feat_hw
        self._jit_features = jax.jit(self._features_impl)
        self._jit_cond = jax.jit(self._cond_impl,
                                 static_argnames=("multimask", "has_points"))
        self._jit_track = jax.jit(self._track_impl,
                                  static_argnames=("multimask",))
        self._jit_encode = jax.jit(self._encode_impl,
                                   static_argnames=("is_pts",))
        self._jit_mask_as_output = jax.jit(self._mask_as_output_impl)

    # ------------------------------------------------------------ device fns
    def _features_impl(self, params, img):
        out = self.model.apply({"params": params}, img[None],
                               method=self.model.forward_image)
        return out["backbone_fpn"], out["vision_pos_enc"]

    def _heads(self, params, pix, coords, labels, mask_in, hr, multimask):
        return self.model.apply(
            {"params": params}, pix, coords, labels, mask_in, hr, multimask,
            method=self.model.forward_sam_heads)

    def _cond_impl(self, params, fpn, coords, labels, mask_in, multimask,
                   has_points):
        """Prompted conditioning frame: no-mem embed + SAM heads."""
        feats = fpn[-1]
        b = coords.shape[0] if has_points else mask_in.shape[0]
        flat = feats.reshape(1, self._n_feat, self.cfg.d_model)
        flat = self.model.apply({"params": params}, flat,
                                method=self.model.no_mem_features)
        pix = jnp.broadcast_to(
            flat.reshape(1, self._feat_hw, self._feat_hw, self.cfg.d_model),
            (b, self._feat_hw, self._feat_hw, self.cfg.d_model))
        hr = [fpn[0], fpn[1]] if self.cfg.use_high_res_features_in_sam else None
        return self._heads(params, pix, coords if has_points else None,
                           labels if has_points else None, mask_in, hr,
                           multimask)

    def _track_impl(self, params, fpn, pos_enc, memory, memory_pos,
                    memory_valid, multimask):
        """Non-conditioning frame: fuse with memory, run heads (no prompts)."""
        b = memory.shape[0]
        feats = fpn[-1]
        flat = jnp.broadcast_to(
            feats.reshape(1, self._n_feat, self.cfg.d_model),
            (b, self._n_feat, self.cfg.d_model))
        pos = jnp.broadcast_to(
            pos_enc[-1].reshape(1, self._n_feat, self.cfg.d_model),
            (b, self._n_feat, self.cfg.d_model))
        n_ptr_tokens = (self.cfg.max_obj_ptrs_in_encoder
                        * (self.cfg.hidden_dim // self.cfg.mem_dim))
        fused = self.model.apply(
            {"params": params}, flat, pos, memory, memory_pos,
            n_ptr_tokens, memory_valid,
            method=self.model.memory_conditioned_features)
        pix = fused.reshape(b, self._feat_hw, self._feat_hw, self.cfg.d_model)
        hr = [fpn[0], fpn[1]] if self.cfg.use_high_res_features_in_sam else None
        return self._heads(params, pix, None, None, None, hr, multimask)

    def _encode_impl(self, params, fpn, high_res_masks, is_pts):
        b = high_res_masks.shape[0]
        feats = fpn[-1]
        pix = jnp.broadcast_to(
            feats, (b,) + feats.shape[1:])
        return self.model.apply(
            {"params": params}, pix, high_res_masks[..., None], is_pts,
            method=self.model.encode_memory)

    def _mask_as_output_impl(self, params, fpn, mask_inputs):
        """use_mask_input_as_output_without_sam (sam2_base.py:457-507)."""
        c = self.cfg
        out_scale, out_bias = 20.0, -10.0
        hr = mask_inputs.astype(jnp.float32) * out_scale + out_bias
        lr = resize_hw(hr, (c.image_size // 4, c.image_size // 4),
                       mode="bilinear", antialias=True)
        # object pointer via SAM decoder on downsampled mask prompt
        b = mask_inputs.shape[0]
        feats = fpn[-1]
        pix = jnp.broadcast_to(feats, (b,) + feats.shape[1:])
        hrf = [fpn[0], fpn[1]] if c.use_high_res_features_in_sam else None
        mask_ds = self.model.apply(
            {"params": params}, hr[..., None].astype(self.model.dtype),
            method=lambda m, x: m.mask_downsample(x))
        heads = self._heads(self.params, pix, None, None, mask_ds, hrf, False)
        obj_ptr = heads[3]
        is_obj = jnp.any(mask_inputs.reshape(b, -1) > 0, axis=1)[:, None]
        lam = is_obj.astype(jnp.float32)
        obj_score_logits = out_scale * lam + out_bias
        if c.pred_obj_scores and c.fixed_no_obj_ptr:
            obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1 - lam) * self.model.apply(
                {"params": self.params}, method=lambda m: m.no_obj_ptr)
        return lr, hr, obj_ptr, obj_score_logits

    # ------------------------------------------------------------- host API
    def init_state(self, images):
        """images: [T, H, W, 3] float in [0,1] (already square-resized to
        cfg.image_size by the loader)."""
        images = np.asarray(images)
        assert images.shape[1] == images.shape[2] == self.cfg.image_size
        state = {
            "images": images,
            "num_frames": len(images),
            "point_inputs_per_obj": {},
            "mask_inputs_per_obj": {},
            "obj_id_to_idx": OrderedDict(),
            "output_dict_per_obj": {},   # obj_idx -> {"cond": {t: out}, "non_cond": {t: out}}
            "feat_cache": {},
        }
        self._get_features(state, 0)  # warm frame 0 like the reference (:104)
        return state

    def _get_features(self, state, frame_idx):
        if frame_idx not in state["feat_cache"]:
            from no_time_to_train_tpu.models.matching.pipeline import _normalize
            img = jnp.asarray(_normalize(state["images"][frame_idx]))
            state["feat_cache"] = {
                frame_idx: self._jit_features(self.params, img)}
        return state["feat_cache"][frame_idx]

    def _obj_idx(self, state, obj_id):
        if obj_id not in state["obj_id_to_idx"]:
            state["obj_id_to_idx"][obj_id] = len(state["obj_id_to_idx"])
            idx = state["obj_id_to_idx"][obj_id]
            state["point_inputs_per_obj"][idx] = {}
            state["mask_inputs_per_obj"][idx] = {}
            state["output_dict_per_obj"][idx] = {"cond": {}, "non_cond": {}}
        return state["obj_id_to_idx"][obj_id]

    def add_new_points_or_box(self, state, frame_idx, obj_id, points=None,
                              labels=None, box=None, normalize_coords=True,
                              clear_old_points=True):
        """Reference :171-318. clear_old_points=False appends the new clicks
        to the frame's existing prompts (reference misc.concat_points
        :283-291)."""
        idx = self._obj_idx(state, obj_id)
        s = self.cfg.image_size
        pts = np.zeros((0, 2), np.float32)
        lbl = np.zeros((0,), np.int32)
        if box is not None:
            box = np.asarray(box, np.float32).reshape(2, 2)
            pts = np.concatenate([pts, box], axis=0)
            lbl = np.concatenate([lbl, np.array([2, 3], np.int32)])
        if points is not None:
            pts = np.concatenate([pts, np.asarray(points, np.float32)], axis=0)
            lbl = np.concatenate([lbl, np.asarray(labels, np.int32)])
        old = state["point_inputs_per_obj"][idx].get(frame_idx)
        if not clear_old_points and old is not None:
            pts = np.concatenate([old[0], pts], axis=0)
            lbl = np.concatenate([old[1], lbl], axis=0)
        state["point_inputs_per_obj"][idx][frame_idx] = (pts, lbl)
        state["mask_inputs_per_obj"][idx].pop(frame_idx, None)
        return self._interactive_predict(state, frame_idx)

    def add_new_mask(self, state, frame_idx, obj_id, mask):
        """Reference :319-399; mask: [H, W] binary at image_size."""
        idx = self._obj_idx(state, obj_id)
        state["mask_inputs_per_obj"][idx][frame_idx] = \
            np.asarray(mask, np.float32)
        state["point_inputs_per_obj"][idx].pop(frame_idx, None)
        return self._interactive_predict(state, frame_idx)

    def _interactive_predict(self, state, frame_idx):
        """Run the conditioning step on the prompted objects of this frame and
        return (obj_ids, low-res mask logits)."""
        fpn, _ = self._get_features(state, frame_idx)
        obj_ids, masks = [], []
        for obj_id, idx in state["obj_id_to_idx"].items():
            out = self._run_cond_frame(state, frame_idx, idx, fpn,
                                       run_mem=False)
            if out is None:
                continue
            obj_ids.append(obj_id)
            masks.append(out["pred_masks"])
        return frame_idx, obj_ids, (np.concatenate(masks)
                                    if masks else np.zeros((0, 1, 1)))

    def _run_cond_frame(self, state, frame_idx, idx, fpn, run_mem=True):
        c = self.cfg
        pts = state["point_inputs_per_obj"][idx].get(frame_idx)
        msk = state["mask_inputs_per_obj"][idx].get(frame_idx)
        if pts is None and msk is None:
            return None
        if msk is not None and c.use_mask_input_as_output_without_sam:
            lr, hr, obj_ptr, obj_logits = self._jit_mask_as_output(
                self.params, fpn, jnp.asarray(msk)[None])
            lr, hr = lr[:, None], hr[:, None]
        else:
            if pts is not None:
                coords = jnp.asarray(pts[0])[None]
                labels = jnp.asarray(pts[1])[None]
                n_pts = pts[0].shape[0]
                mask_in = None
                has_points = True
            else:
                coords = labels = None
                emb4 = c.sam_image_embedding_size * 4
                mask_in = resize_hw(jnp.asarray(msk)[None], (emb4, emb4),
                                    mode="bilinear", antialias=True)[..., None]
                n_pts = 0
                has_points = False
            multimask = (c.multimask_output_in_sam
                         and c.multimask_min_pt_num <= n_pts
                         <= c.multimask_max_pt_num)
            lr, hr, ious, obj_ptr, obj_logits = self._jit_cond(
                self.params, fpn, coords, labels, mask_in,
                multimask=multimask, has_points=has_points)
        out = {"pred_masks": np.asarray(lr[:, 0]),
               "pred_masks_high_res": hr[:, 0],
               "obj_ptr": obj_ptr[0]}
        if run_mem and c.num_maskmem > 0:
            mem_feat, mem_pos = self._jit_encode(
                self.params, fpn, hr[:, 0], is_pts=(pts is not None))
            out["maskmem_features"] = mem_feat[0]
            out["maskmem_pos_enc"] = mem_pos[0]
        state["output_dict_per_obj"][idx]["cond"][frame_idx] = out
        return out

    # -------------------------------------------------------------- tracking
    def _build_memory(self, state, frame_idx, idx, reverse=False):
        """Assemble the fixed-layout memory for one object (sam2_base.py
        :563-713): cond frames (t_pos 0) + previous num_maskmem-1 frames +
        up to max_obj_ptrs past object pointers."""
        c = self.cfg
        outs = state["output_dict_per_obj"][idx]
        n_tok = self._n_feat
        mem_dim = c.mem_dim
        slots = c.num_maskmem
        sel_cond, unsel_cond = select_closest_cond_frames(
            frame_idx, outs["cond"], c.max_cond_frames_in_attn)

        entries = [(0, out) for _, out in sel_cond.items()]
        r = c.memory_temporal_stride_for_eval
        for t_pos in range(1, c.num_maskmem):
            t_rel = c.num_maskmem - t_pos
            if t_rel == 1:
                prev_idx = frame_idx + t_rel if reverse else frame_idx - t_rel
            else:
                if not reverse:
                    prev_idx = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
                else:
                    prev_idx = -(-(frame_idx + 2) // r) * r + (t_rel - 2) * r
            out = outs["non_cond"].get(prev_idx, unsel_cond.get(prev_idx))
            entries.append((t_pos, out))

        mem = np.zeros((slots + len(sel_cond), n_tok, mem_dim), np.float32)
        pos = np.zeros_like(mem)
        valid = np.zeros((mem.shape[0],), bool)
        # fixed layout: first len(entries) rows in order (cond first)
        tpos_table = np.asarray(self.params["maskmem_tpos_enc"], np.float32)
        row = 0
        for t_pos, out in entries:
            if out is None or "maskmem_features" not in out:
                row += 1
                continue
            mem[row] = np.asarray(out["maskmem_features"], np.float32
                                  ).reshape(n_tok, mem_dim)
            p = np.asarray(out["maskmem_pos_enc"], np.float32
                           ).reshape(n_tok, mem_dim)
            pos[row] = p + tpos_table[c.num_maskmem - t_pos - 1]
            valid[row] = True
            row += 1

        # object pointers
        n_ptr = c.max_obj_ptrs_in_encoder
        ptr_dim = c.hidden_dim
        ptrs = np.zeros((n_ptr, ptr_dim), np.float32)
        ptr_valid = np.zeros((n_ptr,), bool)
        if c.use_obj_ptrs_in_encoder:
            pool = {t: o for t, o in sel_cond.items()
                    if (t >= frame_idx if reverse else t <= frame_idx)} \
                if c.only_obj_ptrs_in_the_past_for_eval else dict(sel_cond)
            pos_and_ptrs = [(abs(frame_idx - t), o["obj_ptr"])
                            for t, o in pool.items()]
            max_ptrs = min(state["num_frames"], n_ptr)
            for t_diff in range(1, max_ptrs):
                t = frame_idx + t_diff if reverse else frame_idx - t_diff
                if t < 0 or t >= state["num_frames"]:
                    break
                out = outs["non_cond"].get(t, unsel_cond.get(t))
                if out is not None:
                    pos_and_ptrs.append((t_diff, out["obj_ptr"]))
            for j, (_, p) in enumerate(pos_and_ptrs[:n_ptr]):
                ptrs[j] = np.asarray(p, np.float32)
                ptr_valid[j] = True
        return mem, pos, valid, ptrs, ptr_valid

    def _track_frame(self, state, frame_idx, reverse=False):
        c = self.cfg
        fpn, pos_enc = self._get_features(state, frame_idx)
        n_obj = len(state["obj_id_to_idx"])
        mems, poss, valids, ptrs, ptr_valids = [], [], [], [], []
        cond_rows = None
        for idx in range(n_obj):
            m, p, v, pt, pv = self._build_memory(state, frame_idx, idx,
                                                 reverse)
            if cond_rows is None:
                cond_rows = m.shape[0]
            mems.append(m); poss.append(p); valids.append(v)
            ptrs.append(pt); ptr_valids.append(pv)
        mem = np.stack(mems)
        pos = np.stack(poss)
        valid = np.stack(valids)
        optrs = np.stack(ptrs)
        optr_valid = np.stack(ptr_valids)

        # flatten: spatial tokens then ptr tokens (split 256-d ptr into 4x64)
        b = n_obj
        n_tok = self._n_feat
        mem_flat = mem.reshape(b, -1, c.mem_dim)
        pos_flat = pos.reshape(b, -1, c.mem_dim)
        tok_valid = np.repeat(valid, n_tok, axis=1)
        split = c.hidden_dim // c.mem_dim
        ptr_tokens = optrs.reshape(b, -1, split, c.mem_dim).reshape(
            b, -1, c.mem_dim)
        ptr_tok_pos = np.zeros_like(ptr_tokens)
        ptr_tok_valid = np.repeat(optr_valid, split, axis=1)

        memory = jnp.asarray(np.concatenate([mem_flat, ptr_tokens], axis=1))
        memory_pos = jnp.asarray(np.concatenate([pos_flat, ptr_tok_pos],
                                                axis=1))
        memory_valid = jnp.asarray(np.concatenate([tok_valid, ptr_tok_valid],
                                                  axis=1))

        multimask = c.multimask_output_in_sam and c.multimask_output_for_tracking \
            and (c.multimask_min_pt_num <= 0 <= c.multimask_max_pt_num)
        lr, hr, ious, obj_ptr, obj_logits = self._jit_track(
            self.params, fpn, pos_enc, memory, memory_pos, memory_valid,
            multimask=multimask)

        hr_for_mem = hr[:, 0]
        if self.cfg.non_overlap_masks_for_mem_enc and n_obj > 1:
            hr_for_mem = apply_non_overlapping_constraints(hr_for_mem)
        mem_feat, mem_pos = self._jit_encode(self.params, fpn, hr_for_mem,
                                             is_pts=False)
        for idx in range(n_obj):
            state["output_dict_per_obj"][idx]["non_cond"][frame_idx] = {
                "pred_masks": np.asarray(lr[idx]),
                "obj_ptr": obj_ptr[idx],
                "maskmem_features": mem_feat[idx],
                "maskmem_pos_enc": mem_pos[idx],
            }
        return np.asarray(lr)

    def propagate_in_video_preflight(self, state):
        """Encode memories for all prompted (conditioning) frames
        (reference :579-646)."""
        for idx in range(len(state["obj_id_to_idx"])):
            frames = set(state["point_inputs_per_obj"][idx]) | set(
                state["mask_inputs_per_obj"][idx])
            for t in sorted(frames):
                fpn, _ = self._get_features(state, t)
                self._run_cond_frame(state, t, idx, fpn, run_mem=True)

    def propagate_in_video(self, state, start_frame_idx=None,
                           max_frame_num_to_track=None, reverse=False):
        """Generator over (frame_idx, obj_ids, low-res mask logits [B, H, W])."""
        self.propagate_in_video_preflight(state)
        obj_ids = list(state["obj_id_to_idx"].keys())
        cond_frames = set()
        for idx in range(len(obj_ids)):
            cond_frames |= set(state["output_dict_per_obj"][idx]["cond"])
        assert cond_frames, "no prompts provided"
        if start_frame_idx is None:
            start_frame_idx = min(cond_frames)
        if max_frame_num_to_track is None:
            max_frame_num_to_track = state["num_frames"]
        if reverse:
            end = max(start_frame_idx - max_frame_num_to_track, 0)
            rng = range(start_frame_idx, end - 1, -1) \
                if start_frame_idx > 0 else [start_frame_idx]
        else:
            end = min(start_frame_idx + max_frame_num_to_track,
                      state["num_frames"] - 1)
            rng = range(start_frame_idx, end + 1)
        for t in rng:
            if t in cond_frames:
                masks = np.stack([
                    np.asarray(state["output_dict_per_obj"][i]["cond"][t]
                               ["pred_masks"]).reshape(
                        self.cfg.image_size // 4, self.cfg.image_size // 4)
                    if t in state["output_dict_per_obj"][i]["cond"] else
                    np.full((self.cfg.image_size // 4,
                             self.cfg.image_size // 4), NO_OBJ_SCORE,
                            np.float32)
                    for i in range(len(obj_ids))])
            else:
                masks = self._track_frame(state, t, reverse)[:, 0]
            if self.cfg.fill_hole_area > 0:
                masks = np.asarray(fill_holes_in_mask_scores(
                    jnp.asarray(masks), self.cfg.fill_hole_area))
            yield t, obj_ids, masks
