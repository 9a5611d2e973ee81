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
        self._jit_encode = jax.jit(self._encode_impl,
                                   static_argnames=("is_pts",))
        self._jit_mask_as_output = jax.jit(self._mask_as_output_impl)
        self._jit_track_fused = jax.jit(
            self._track_fused_impl,
            static_argnames=("multimask", "fill_area"))
        # cached device constants for the on-device memory assembly
        self._zero_tok = None
        self._tpos_host = None
        self._zero_ptr = None
        # Tracked-frame outputs live on DEVICE (the perf design); without
        # eviction a long video accumulates ~2 MB of HBM per frame per
        # object. Entries farther than this many frames from the one being
        # tracked can never be selected again (maskmem lookback is
        # (num_maskmem-2)*stride+2, obj-ptr lookback max_obj_ptrs), so
        # they are pruned. Set history_window=0 on the instance to keep
        # everything (the reference's offload_state_to_cpu=False analogue).
        r = max(c.memory_temporal_stride_for_eval, 1)
        self.history_window = max((c.num_maskmem - 2) * r + 2,
                                  c.max_obj_ptrs_in_encoder, c.num_maskmem
                                  ) + 1

    # ------------------------------------------------------------ device fns
    def _features_impl(self, params, img):
        # normalize on device (the video frames live device-resident; a host
        # normalize would force a 12 MB D2H+H2D round trip per frame)
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        out = self.model.apply({"params": params},
                               _normalize(img.astype(jnp.float32))[None],
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

    def _track_fused_impl(self, params, fpn, pos_enc, mem_rows, pos_rows,
                          tpos_rows, valid, ptr_rows, ptr_valid, multimask,
                          fill_area):
        """The WHOLE per-tracked-frame device chain in one traced program:
        fixed-layout memory assembly (stack + temporal-pos add + flatten),
        memory-conditioned heads, non-overlap constraint, memory encoding of
        the predicted masks, and the yielded-mask hole filling. One jit
        dispatch per frame instead of ~20 eager ops + 4 jit calls — over a
        remote-TPU link the per-dispatch turnaround dominated the loop
        (device time ~37 ms/frame vs ~200 ms wall before this fold).

        mem_rows/pos_rows/ptr_rows: per-object tuples of per-slot device
        arrays (stored by earlier frames); tpos_rows [b, R, mem_dim];
        valid [b, R] / ptr_valid [b, P] bool."""
        c = self.cfg
        b = len(mem_rows)
        n_tok, mem_dim = self._n_feat, c.mem_dim
        f32 = jnp.float32

        def rows_to_stack(rows):
            return jnp.stack([
                jnp.stack([jnp.reshape(r, (n_tok, mem_dim)).astype(f32)
                           for r in obj]) for obj in rows])
        mem = rows_to_stack(mem_rows)                      # [b, R, n, d]
        pos = rows_to_stack(pos_rows) + tpos_rows[:, :, None, :]
        pos = jnp.where(valid[:, :, None, None], pos, 0.0)
        mem = jnp.where(valid[:, :, None, None], mem, 0.0)

        optrs = jnp.stack([jnp.stack([p.astype(f32) for p in obj])
                           for obj in ptr_rows])           # [b, P, ptr_dim]
        split = c.hidden_dim // mem_dim
        ptr_tokens = optrs.reshape(b, -1, split, mem_dim).reshape(
            b, -1, mem_dim)
        ptr_tokens = jnp.where(
            jnp.repeat(ptr_valid, split, axis=1)[:, :, None], ptr_tokens, 0.0)

        memory = jnp.concatenate([mem.reshape(b, -1, mem_dim), ptr_tokens],
                                 axis=1)
        memory_pos = jnp.concatenate(
            [pos.reshape(b, -1, mem_dim), jnp.zeros_like(ptr_tokens)], axis=1)
        memory_valid = jnp.concatenate(
            [jnp.repeat(valid, n_tok, axis=1),
             jnp.repeat(ptr_valid, split, axis=1)], axis=1)

        lr, hr, ious, obj_ptr, obj_logits = self._track_impl(
            params, fpn, pos_enc, memory, memory_pos, memory_valid,
            multimask)

        hr_for_mem = hr[:, 0]
        if c.non_overlap_masks_for_mem_enc and b > 1:
            hr_for_mem = apply_non_overlapping_constraints(hr_for_mem)
        mem_feat, mem_pos = self._encode_impl(params, fpn, hr_for_mem,
                                              is_pts=False)
        filled = (fill_holes_in_mask_scores(lr[:, 0], fill_area)
                  if fill_area > 0 else lr[:, 0])
        # f32 obj_ptr: same stable-signature rule as the memory slots
        return lr, obj_ptr.astype(jnp.float32), mem_feat, mem_pos, filled

    def _encode_impl(self, params, fpn, high_res_masks, is_pts):
        b = high_res_masks.shape[0]
        feats = fpn[-1]
        pix = jnp.broadcast_to(
            feats, (b,) + feats.shape[1:])
        mem, pos = self.model.apply(
            {"params": params}, pix, high_res_masks[..., None], is_pts,
            method=self.model.encode_memory)
        # normalized storage form [b, n_tok, mem_dim] f32: every memory slot
        # array the host stores must have ONE shape/dtype, or the fused
        # track jit retraces whenever the slot fill pattern changes
        shape = (b, self._n_feat, self.cfg.mem_dim)
        return (mem.reshape(shape).astype(jnp.float32),
                pos.reshape(shape).astype(jnp.float32))

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
    def init_state(self, images, store_on_device=True):
        """images: [T, H, W, 3] float in [0,1] (already square-resized to
        cfg.image_size by the loader). With store_on_device (default) the
        whole clip uploads ONCE and per-frame feature extraction slices it
        device-side — the per-frame host upload was the video loop's
        dominant cost over a remote-TPU link (the reference's inverse knob
        is offload_video_to_cpu, sam2_video_predictor.py)."""
        images = np.asarray(images, np.float32)
        assert images.shape[1] == images.shape[2] == self.cfg.image_size
        state = {
            "images": jax.device_put(images) if store_on_device else images,
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
            img = state["images"][frame_idx]   # device slice (no host copy)
            if isinstance(img, np.ndarray):
                img = jnp.asarray(img)
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
            masks.append(np.asarray(out["pred_masks"]))
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
        # device-resident outputs: pred_masks stays a lazy device array
        # (the tracking loop re-reads it only for cond frames; callers that
        # need numpy np.asarray at the edge)
        out = {"pred_masks": lr[:, 0],
               "pred_masks_high_res": hr[:, 0],
               # f32: ptr slots must all share one dtype (see _encode_impl)
               "obj_ptr": obj_ptr[0].astype(jnp.float32)}
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

        # Fixed layout, fully device-resident: every slot's maskmem
        # features / pos enc stayed on device where the encode step produced
        # them — a host-numpy assembly here would fetch ~2 MB per slot per
        # frame and re-upload the stack (~25 MB/frame of D2H+H2D over a
        # remote-TPU link, formerly the tracking loop's dominant cost).
        # Rows are handed RAW to the fused track jit (stack/reshape/
        # temporal-pos add happen in-program); host builds only the tiny
        # validity flags and the temporal-pos row table.
        n_rows = slots + len(sel_cond)
        if self._zero_tok is None or self._zero_tok.shape != (n_tok, mem_dim):
            self._zero_tok = jnp.zeros((n_tok, mem_dim), jnp.float32)
            self._tpos_host = np.asarray(
                self.params["maskmem_tpos_enc"], np.float32).reshape(
                c.num_maskmem, mem_dim)
        zero = self._zero_tok
        valid = np.zeros((n_rows,), bool)
        tpos_rows = np.zeros((n_rows, mem_dim), np.float32)
        mem_rows, pos_rows = [], []
        # fixed layout: first len(entries) rows in order (cond first)
        for row, (t_pos, out) in enumerate(entries):
            if out is None or "maskmem_features" not in out:
                mem_rows.append(zero)
                pos_rows.append(zero)
                continue
            mem_rows.append(out["maskmem_features"])
            pos_rows.append(out["maskmem_pos_enc"])
            tpos_rows[row] = self._tpos_host[c.num_maskmem - t_pos - 1]
            valid[row] = True
        mem_rows += [zero] * (n_rows - len(entries))
        pos_rows += [zero] * (n_rows - len(entries))

        # object pointers (device rows + host validity, same scheme)
        n_ptr = c.max_obj_ptrs_in_encoder
        ptr_dim = c.hidden_dim
        if self._zero_ptr is None or self._zero_ptr.shape != (ptr_dim,):
            self._zero_ptr = jnp.zeros((ptr_dim,), jnp.float32)
        ptr_rows = []
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
                ptr_rows.append(p)
                ptr_valid[j] = True
        ptr_rows += [self._zero_ptr] * (n_ptr - len(ptr_rows))
        return mem_rows, pos_rows, tpos_rows, valid, ptr_rows, ptr_valid

    def _track_frame(self, state, frame_idx, reverse=False):
        c = self.cfg
        fpn, pos_enc = self._get_features(state, frame_idx)
        n_obj = len(state["obj_id_to_idx"])
        mems, poss, tposs, valids, ptrs, ptr_valids = [], [], [], [], [], []
        for idx in range(n_obj):
            m, p, tp, v, pt, pv = self._build_memory(state, frame_idx, idx,
                                                     reverse)
            mems.append(tuple(m)); poss.append(tuple(p)); tposs.append(tp)
            valids.append(v)
            ptrs.append(tuple(pt)); ptr_valids.append(pv)

        multimask = c.multimask_output_in_sam and c.multimask_output_for_tracking \
            and (c.multimask_min_pt_num <= 0 <= c.multimask_max_pt_num)
        lr, obj_ptr, mem_feat, mem_pos, filled = self._jit_track_fused(
            self.params, fpn, pos_enc, tuple(mems), tuple(poss),
            jnp.asarray(np.stack(tposs)), jnp.asarray(np.stack(valids)),
            tuple(ptrs), jnp.asarray(np.stack(ptr_valids)),
            multimask=multimask, fill_area=c.fill_hole_area)

        for idx in range(n_obj):
            nc = state["output_dict_per_obj"][idx]["non_cond"]
            nc[frame_idx] = {
                "pred_masks": lr[idx],
                "obj_ptr": obj_ptr[idx],
                "maskmem_features": mem_feat[idx],
                "maskmem_pos_enc": mem_pos[idx],
            }
            if self.history_window:
                # evict device-resident memories no future frame can select
                # (distance-symmetric, so reverse passes stay correct)
                for t in [t for t in nc
                          if abs(t - frame_idx) > self.history_window]:
                    del nc[t]
        # device array (hole filling already applied in-program); the
        # CONSUMER decides when to fetch (np.asarray), so the whole
        # propagation pipeline dispatches asynchronously
        return filled

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
        hw = self.cfg.image_size // 4
        for t in rng:
            if t in cond_frames:
                masks = jnp.stack([
                    jnp.reshape(state["output_dict_per_obj"][i]["cond"][t]
                                ["pred_masks"], (hw, hw))
                    if t in state["output_dict_per_obj"][i]["cond"] else
                    jnp.full((hw, hw), NO_OBJ_SCORE, jnp.float32)
                    for i in range(len(obj_ids))])
                if self.cfg.fill_hole_area > 0:
                    masks = fill_holes_in_mask_scores(
                        masks, self.cfg.fill_hole_area)
            else:
                # [b, H, W], hole filling already applied inside the fused
                # track program
                masks = self._track_frame(state, t, reverse)
            # device array (np.asarray-compatible): fetching here would
            # fence every frame on the submit->fetch round trip; streaming
            # consumers overlap the fetch with the next frame instead
            yield t, obj_ids, masks
