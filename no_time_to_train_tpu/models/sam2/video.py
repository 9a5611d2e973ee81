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
from no_time_to_train_tpu.ops.resize import resize_hw
from no_time_to_train_tpu.ops.connected_components import fill_holes_in_mask_scores


def apply_non_overlapping_constraints(pred_masks):
    """Keep only the highest-scoring object per pixel; suppress others to
    <= -10 (reference sam2_base.py:869-887). pred_masks: [B, H, W]."""
    if pred_masks.shape[0] == 1:
        return pred_masks
    max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
    batch_obj = jnp.arange(pred_masks.shape[0])[:, None, None]
    keep = max_obj == batch_obj
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, max=-10.0))


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
    def __init__(self, model: SAM2, params,
                 clear_non_cond_mem_around_input=False,
                 clear_non_cond_mem_for_multi_obj=False,
                 non_overlap_masks=False):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        # correction-click memory hygiene knobs (reference
        # sam2_video_predictor.py:21-37)
        self.clear_non_cond_mem_around_input = clear_non_cond_mem_around_input
        self.clear_non_cond_mem_for_multi_obj = clear_non_cond_mem_for_multi_obj
        # apply cross-object non-overlap to final video-res outputs
        # (reference :33, used in _get_orig_video_res_output :420-421)
        self.non_overlap_masks = non_overlap_masks
        c = self.cfg
        self._feat_hw = c.sam_image_embedding_size
        self._n_feat = self._feat_hw * self._feat_hw
        self._jit_features = jax.jit(self._features_impl)
        self._jit_cond = jax.jit(self._cond_impl,
                                 static_argnames=("multimask", "has_points"))
        self._jit_correct = jax.jit(
            self._correct_impl,
            static_argnames=("multimask", "has_points", "has_mask"))
        self._jit_consolidate_encode = jax.jit(
            self._consolidate_encode_impl, static_argnames=("nonoverlap",))
        self._jit_encode = jax.jit(self._encode_impl,
                                   static_argnames=("is_pts",))
        self._jit_mask_as_output = jax.jit(self._mask_as_output_impl)
        self._jit_track_fused = jax.jit(
            self._track_fused_impl,
            static_argnames=("multimask", "fill_area"))
        self._jit_scan = jax.jit(
            self._scan_impl,
            static_argnames=("multimask", "fill_area", "reverse"))
        self._jit_unstack = jax.jit(self._unstack_impl)
        self._jit_video_res = jax.jit(
            self._video_res_impl, static_argnames=("hw", "nonoverlap"))
        self._jit_video_res_chunk = jax.jit(
            self._video_res_chunk_impl, static_argnames=("hw", "nonoverlap"))
        # Chunked-scan tracking: frames per device dispatch inside
        # propagate_in_video (see _scan_plan). 0 disables (pure per-frame).
        self.scan_chunk = 8
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
        # maskmem ring window for the chunked scan: strictly larger than the
        # maximum strided lookback/lookahead ((num_maskmem-2)*r + 1)
        self._ring_W = max((c.num_maskmem - 2) * r + 2, 2)

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
                    memory_valid, multimask, coords=None, labels=None,
                    mask_in=None):
        """Memory-conditioned heads. Prompts are None while tracking; the
        correction path (clicks on an already-tracked frame) passes the new
        clicks plus the previous mask logits (reference sam2_base.py:804-826
        with is_init_cond_frame=False)."""
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
        return self._heads(params, pix, coords, labels, mask_in, hr, multimask)

    def _assemble_memory(self, mem, pos, tpos_rows, valid, optrs, ptr_valid):
        """Flatten fixed-layout memory stacks into the attention operands
        (reference sam2_base.py:563-713 concatenation, padded+masked here).

        mem/pos: [b, R, n_tok, mem_dim] f32; tpos_rows [b or 1, R, mem_dim];
        valid [b, R] bool; optrs [b, P, ptr_dim]; ptr_valid [b, P] bool."""
        c = self.cfg
        b, mem_dim = mem.shape[0], c.mem_dim
        pos = pos + tpos_rows[:, :, None, :]
        pos = jnp.where(valid[:, :, None, None], pos, 0.0)
        mem = jnp.where(valid[:, :, None, None], mem, 0.0)

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
            [jnp.repeat(valid, self._n_feat, axis=1),
             jnp.repeat(ptr_valid, split, axis=1)], axis=1)
        return memory, memory_pos, memory_valid

    def _track_core(self, params, fpn, pos_enc, memory, memory_pos,
                    memory_valid, multimask, fill_area):
        """Memory-conditioned heads -> non-overlap -> memory encode -> hole
        fill: the shared device chain of the per-frame fused program and the
        chunked scan program."""
        c = self.cfg
        b = memory.shape[0]
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
        mem, pos, optrs = self._stack_rows(mem_rows, pos_rows, ptr_rows)
        memory, memory_pos, memory_valid = self._assemble_memory(
            mem, pos, tpos_rows, valid, optrs, ptr_valid)
        return self._track_core(params, fpn, pos_enc, memory, memory_pos,
                                memory_valid, multimask, fill_area)

    def _stack_rows(self, mem_rows, pos_rows, ptr_rows):
        """Per-object tuples of per-slot device arrays -> stacked
        [b, R, n_tok, mem_dim] / [b, P, ptr_dim] f32 operands."""
        n_tok, mem_dim = self._n_feat, self.cfg.mem_dim
        f32 = jnp.float32

        def rows_to_stack(rows):
            return jnp.stack([
                jnp.stack([jnp.reshape(r, (n_tok, mem_dim)).astype(f32)
                           for r in obj]) for obj in rows])
        mem = rows_to_stack(mem_rows)                      # [b, R, n, d]
        pos = rows_to_stack(pos_rows)
        optrs = jnp.stack([jnp.stack([p.astype(f32) for p in obj])
                           for obj in ptr_rows])           # [b, P, ptr_dim]
        return mem, pos, optrs

    def _correct_impl(self, params, fpn, pos_enc, mem_rows, pos_rows,
                      tpos_rows, valid, ptr_rows, ptr_valid, coords, labels,
                      mask_in, multimask, has_points, has_mask):
        """Correction clicks on an ALREADY-TRACKED frame (reference
        sam2_video_predictor.py:262-301 + sam2_base.py track_step with
        is_init_cond_frame=False): memory-conditioned features, then SAM
        heads with the new clicks AND the previous mask logits
        (prev_sam_mask_logits) as the dense prompt."""
        mem, pos, optrs = self._stack_rows(mem_rows, pos_rows, ptr_rows)
        memory, memory_pos, memory_valid = self._assemble_memory(
            mem, pos, tpos_rows, valid, optrs, ptr_valid)
        return self._track_impl(
            params, fpn, pos_enc, memory, memory_pos, memory_valid, multimask,
            coords if has_points else None, labels if has_points else None,
            mask_in if has_mask else None)

    def _consolidate_encode_impl(self, params, fpn, lr_stack, nonoverlap):
        """Preflight memory encoding of a prompted frame's consolidated
        object masks (reference _consolidate_temp_output_across_obj with
        run_mem_encoder=True, sam2_video_predictor.py:521-539): low-res
        masks -> image resolution -> optional non-overlap constraint ->
        batched memory encoder with is_mask_from_pts=True."""
        c = self.cfg
        hr = resize_hw(lr_stack, (c.image_size, c.image_size),
                       mode="bilinear")
        if nonoverlap:
            hr = apply_non_overlapping_constraints(hr)
        return self._encode_impl(params, fpn, hr, is_pts=True)

    def _scan_impl(self, params, images, frame_ids, ring_mem, ring_pos,
                   ring_frame, ptr_ring, ptr_frame, cond_mem, cond_pos,
                   cond_valid, cond_ptrs, cond_ptr_valid, tpos_table,
                   multimask, fill_area, reverse):
        """Track a CHUNK of consecutive non-conditioning frames in ONE traced
        program: a lax.scan whose carry is the memory ring (maskmem slots +
        obj-ptr FIFO), with feature extraction from the device-resident clip
        inside the scan body. The per-frame fused path costs two dispatches
        plus small uploads per frame — wall-measured 64 ms/frame against
        37 ms/frame device time over the remote-TPU link; the scan amortizes
        the dispatch legs over the whole chunk.

        Index arithmetic mirrors _build_memory (reference sam2_base.py
        :563-713): maskmem rows are the strided previous frames; obj-ptr rows
        are conditioning-frame pointers (run constants, `cond_*`) followed by
        the nearest tracked-frame pointers. Ring lookups go through
        frame-id % window slots; a row is valid iff the slot still holds that
        exact frame id, so pre-run gaps mask out exactly like dict misses in
        the per-frame path.

        images: [T, H, W, 3] unnormalized; frame_ids: [CHUNK] i32 consecutive
        (ascending, or descending when reverse), right-padded with -1 for a
        partial tail chunk — padding steps lax.cond-skip the whole body at
        runtime (carry passes through, outputs are zeros the host discards),
        so a tail of k frames costs k frame-computes, not CHUNK;
        ring_mem/ring_pos
        [b, W, n_tok, mem_dim] f32; ring_frame [W] i32 (-1 = empty);
        ptr_ring [b, Pw, ptr_dim]; ptr_frame [Pw] i32; cond_mem/cond_pos
        [b, nc, n_tok, mem_dim]; cond_valid [b, nc]; cond_ptrs
        [b, ncp, ptr_dim]; cond_ptr_valid [b, ncp]; tpos_table
        [nc + num_maskmem - 1, mem_dim].
        """
        c = self.cfg
        M = c.num_maskmem
        r = max(c.memory_temporal_stride_for_eval, 1)
        b, W = ring_mem.shape[0], ring_mem.shape[1]
        Pw = ptr_ring.shape[1]
        ncp = cond_ptrs.shape[1]
        total_ptr = c.max_obj_ptrs_in_encoder
        n_fifo = total_ptr - ncp
        # the reference's pointer pool scans min(num_frames, n_ptr) - 1 past
        # frames, SKIPS missing ones (e.g. a conditioning frame inside the
        # lookback), and truncates to n_ptr afterwards — so a gap shifts a
        # farther frame in. Scan over all candidates, keep the first n_fifo
        # valid by rank (sam2_video 's pos_and_ptrs[:max_obj_ptrs]).
        num_frames = images.shape[0]
        n_cand = max(min(num_frames, total_ptr) - 1, 0)

        def real_step(carry, t):
            ring_mem, ring_pos, ring_frame, ptr_ring, ptr_frame = carry
            img = jax.lax.dynamic_index_in_dim(images, t, 0, keepdims=False)
            fpn, pos_enc = self._features_impl(params, img)

            prevs = []
            for t_pos in range(1, M):
                t_rel = M - t_pos
                if t_rel == 1:
                    prev = t + 1 if reverse else t - 1
                elif reverse:
                    prev = -(-(t + 2) // r) * r + (t_rel - 2) * r
                else:
                    prev = ((t - 2) // r) * r - (t_rel - 2) * r
                prevs.append(prev)
            prevs = jnp.stack(prevs)
            slots = prevs % W
            mem = jnp.concatenate(
                [cond_mem, jnp.take(ring_mem, slots, axis=1)], axis=1)
            pos = jnp.concatenate(
                [cond_pos, jnp.take(ring_pos, slots, axis=1)], axis=1)
            ok = ((jnp.take(ring_frame, slots) == prevs) & (prevs >= 0)
                  & (prevs < num_frames))
            valid = jnp.concatenate(
                [cond_valid, jnp.broadcast_to(ok[None], (b, M - 1))], axis=1)

            offs = jnp.arange(1, n_cand + 1, dtype=t.dtype)
            fs = t + offs if reverse else t - offs
            pok = ((jnp.take(ptr_frame, fs % Pw) == fs) & (fs >= 0)
                   & (fs < num_frames))
            if not c.use_obj_ptrs_in_encoder:
                pok = jnp.zeros_like(pok)
            # rank-gated placement: candidate with the k-th smallest t_diff
            # among the VALID ones lands in row ncp + k - 1; the rest drop
            rank = jnp.cumsum(pok.astype(jnp.int32))
            slot = jnp.where(pok & (rank <= n_fifo), ncp + rank - 1,
                             total_ptr)
            cands = jnp.take(ptr_ring, fs % Pw, axis=1)   # [b, n_cand, D]
            optrs = jnp.zeros((b, total_ptr, cands.shape[-1]), cands.dtype)
            optrs = optrs.at[:, :ncp].set(cond_ptrs)
            optrs = optrs.at[:, slot].set(cands, mode="drop")
            pv = jnp.zeros((total_ptr,), bool).at[slot].set(True,
                                                            mode="drop")
            ptr_valid = (jnp.zeros((b, total_ptr), bool)
                         .at[:, :ncp].set(cond_ptr_valid) | pv[None])

            memory, memory_pos, memory_valid = self._assemble_memory(
                mem, pos, tpos_table[None], valid, optrs, ptr_valid)
            lr, obj_ptr, mem_feat, mem_pos, filled = self._track_core(
                params, fpn, pos_enc, memory, memory_pos, memory_valid,
                multimask, fill_area)

            s = t % W
            carry = (ring_mem.at[:, s].set(mem_feat),
                     ring_pos.at[:, s].set(mem_pos),
                     ring_frame.at[s].set(t),
                     ptr_ring.at[:, t % Pw].set(obj_ptr),
                     ptr_frame.at[t % Pw].set(t))
            return carry, (lr, obj_ptr, mem_feat, mem_pos, filled)

        def step(carry, t):
            real = lambda cr: real_step(cr, t)
            out_shapes = jax.eval_shape(real, carry)[1]
            skip = lambda cr: (cr, jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), out_shapes))
            return jax.lax.cond(t >= 0, real, skip, carry)

        carry = (ring_mem, ring_pos, ring_frame, ptr_ring, ptr_frame)
        return jax.lax.scan(step, carry, frame_ids)

    def _unstack_impl(self, lr, obj_ptr, mem_feat, mem_pos):
        """Split stacked chunk outputs into per-(frame, object) rows in ONE
        dispatch — lazy per-entry slicing would cost one RPC per row over
        the remote-TPU link (~4 x chunk x objects round trips per run)."""
        def split(a):
            return [[a[i, o] for o in range(a.shape[1])]
                    for i in range(a.shape[0])]
        return split(lr), split(obj_ptr), split(mem_feat), split(mem_pos)

    def _video_res_impl(self, masks, hw, nonoverlap):
        """Low-res mask logits [B, h, w] -> original video resolution
        (reference _get_orig_video_res_output, sam2_video_predictor.py
        :402-422: bilinear align_corners=False upsample + optional
        cross-object non-overlap constraint on the final outputs)."""
        up = resize_hw(masks.astype(jnp.float32), hw)
        if nonoverlap:
            up = apply_non_overlapping_constraints(up)
        return up

    def _video_res_chunk_impl(self, masks, hw, nonoverlap):
        """_video_res_impl over a whole scan chunk [CH, b, h, w] in one
        dispatch, so output_video_res on the chunked-scan path never
        round-trips low-res masks through the host (fetch + re-upload +
        per-frame dispatch RPC over the remote link)."""
        up = resize_hw(masks.astype(jnp.float32), hw)
        if nonoverlap:
            up = jax.vmap(apply_non_overlapping_constraints)(up)
        return up

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
        heads = self._heads(params, pix, None, None, mask_ds, hrf, False)
        obj_ptr = heads[3]
        is_obj = jnp.any(mask_inputs.reshape(b, -1) > 0, axis=1)[:, None]
        lam = is_obj.astype(jnp.float32)
        obj_score_logits = out_scale * lam + out_bias
        if c.pred_obj_scores and c.fixed_no_obj_ptr:
            obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1 - lam) * self.model.apply(
                {"params": params}, method=lambda m: m.no_obj_ptr)
        return lr, hr, obj_ptr, obj_score_logits

    # ------------------------------------------------------------- host API
    def init_state(self, images, store_on_device=True,
                   video_height=None, video_width=None):
        """images: [T, H, W, 3] float in [0,1] (already square-resized to
        cfg.image_size by the loader). With store_on_device (default) the
        whole clip uploads ONCE and per-frame feature extraction slices it
        device-side — the per-frame host upload was the video loop's
        dominant cost over a remote-TPU link (the reference's inverse knob
        is offload_video_to_cpu, sam2_video_predictor.py).

        video_height/video_width: the ORIGINAL video resolution (before the
        loader's square model resize), used by get_orig_video_res_output /
        propagate_in_video(output_video_res=True) — the reference stores
        these from the raw frames (:40-110). load_video_frames returns
        them; defaults to the model input size."""
        images = np.asarray(images, np.float32)
        assert images.shape[1] == images.shape[2] == self.cfg.image_size
        state = {
            "images": jax.device_put(images) if store_on_device else images,
            "num_frames": len(images),
            "video_height": int(video_height or self.cfg.image_size),
            "video_width": int(video_width or self.cfg.image_size),
            "point_inputs_per_obj": {},
            "mask_inputs_per_obj": {},
            "obj_id_to_idx": OrderedDict(),
            "output_dict_per_obj": {},   # obj_idx -> {"cond": {t: out}, "non_cond": {t: out}}
            "feat_cache": {},
            # frame -> {"reverse": bool}; distinguishes initial conditioning
            # prompts from correction clicks (reference :256-262)
            "frames_already_tracked": {},
            "tracking_has_started": False,
            # prompted frames whose decode outputs still need the preflight
            # memory-encode consolidation pass; frame -> is_cond
            # (the reference's temp_output_dict_per_obj analogue)
            "dirty_prompt_frames": {},
            # prompted frames already consolidated, by storage key
            # (reference consolidated_frame_inds)
            "consolidated_frame_inds": {"cond": set(), "non_cond": set()},
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
            if state["tracking_has_started"]:
                # reference :137-160: new objects only before tracking starts
                raise RuntimeError(
                    f"Cannot add new object id {obj_id} after tracking "
                    "starts; call reset_state to restart from scratch.")
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
        :283-291). On an already-tracked frame the clicks CORRECT the
        tracked mask (memory-conditioned decode seeded with the previous
        logits) instead of starting a fresh conditioning frame."""
        idx = self._obj_idx(state, obj_id)
        if (points is not None) != (labels is not None):
            raise ValueError("points and labels must be provided together")
        if points is None and box is None:
            raise ValueError(
                "at least one of points or box must be provided as input")
        s = self.cfg.image_size
        pts = np.zeros((0, 2), np.float32)
        lbl = np.zeros((0,), np.int32)
        if box is not None:
            if not clear_old_points:
                raise ValueError(
                    "cannot add box without clearing old points (box must "
                    "precede point prompts; use clear_old_points=True)")
            if state["tracking_has_started"]:
                import warnings
                warnings.warn(
                    "You are adding a box after tracking starts. SAM 2 may "
                    "not always be able to incorporate a box prompt for "
                    "*refinement*; for an *initial* box input, reset_state "
                    "first.", category=UserWarning, stacklevel=2)
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
        return self._interactive_predict(state, frame_idx, idx)

    def add_new_points(self, *args, **kwargs):
        """Deprecated alias (reference :314-317)."""
        return self.add_new_points_or_box(*args, **kwargs)

    def add_new_mask(self, state, frame_idx, obj_id, mask):
        """Reference :319-399; mask: [H, W] binary at image_size."""
        idx = self._obj_idx(state, obj_id)
        state["mask_inputs_per_obj"][idx][frame_idx] = \
            np.asarray(mask, np.float32)
        state["point_inputs_per_obj"][idx].pop(frame_idx, None)
        return self._interactive_predict(state, frame_idx, idx)

    def _interactive_predict(self, state, frame_idx, target_idx):
        """Decode the NEWLY prompted object on this frame and combine it
        with the other prompted objects' STORED outputs. The reference
        decodes only the clicked object (sam2_video_predictor.py:252-301);
        re-decoding the others would both waste a dispatch per object and,
        on the correction path, mutate their stored outputs with no new
        input (the previous logits feed back as the dense prompt)."""
        fpn, pos_enc = self._get_features(state, frame_idx)
        obj_ids, masks = [], []
        for obj_id, idx in state["obj_id_to_idx"].items():
            if idx == target_idx:
                out = self._decode_prompt_frame(state, frame_idx, idx, fpn,
                                                pos_enc)
            elif (state["point_inputs_per_obj"][idx].get(frame_idx) is None
                  and state["mask_inputs_per_obj"][idx].get(frame_idx)
                  is None):
                out = None
            else:
                outs = state["output_dict_per_obj"][idx]
                out = outs["cond"].get(frame_idx,
                                       outs["non_cond"].get(frame_idx))
            if out is None:
                continue
            obj_ids.append(obj_id)
            masks.append(np.asarray(out["pred_masks"]))
        return frame_idx, obj_ids, (np.concatenate(masks)
                                    if masks else np.zeros((0, 1, 1)))

    def _decode_prompt_frame(self, state, frame_idx, idx, fpn, pos_enc):
        """Decode one object's prompts on a frame (reference
        add_new_points_or_box/_run_single_frame_inference, :252-301). An
        initial conditioning frame runs the no-memory path; a frame that was
        already tracked runs a memory-conditioned CORRECTION: the new clicks
        plus the previous mask logits (clamped to ±32) feed the SAM heads.
        The output is stored under "cond" or "non_cond" per
        add_all_frames_to_correct_as_cond; memory encoding is deferred to
        the preflight consolidation (so cross-object non-overlap applies
        before encoding, like the reference)."""
        c = self.cfg
        pts = state["point_inputs_per_obj"][idx].get(frame_idx)
        msk = state["mask_inputs_per_obj"][idx].get(frame_idx)
        if pts is None and msk is None:
            return None
        is_init = frame_idx not in state["frames_already_tracked"]
        is_cond = is_init or c.add_all_frames_to_correct_as_cond
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
                         and (is_init or c.multimask_output_for_tracking)
                         and c.multimask_min_pt_num <= n_pts
                         <= c.multimask_max_pt_num)
            if is_init:
                lr, hr, ious, obj_ptr, obj_logits = self._jit_cond(
                    self.params, fpn, coords, labels, mask_in,
                    multimask=multimask, has_points=has_points)
            else:
                # correction: memory from the tracked neighborhood, previous
                # logits as the dense prompt (reference :268-285)
                reverse = state["frames_already_tracked"][frame_idx]["reverse"]
                outs = state["output_dict_per_obj"][idx]
                prev = outs["cond"].get(frame_idx,
                                        outs["non_cond"].get(frame_idx))
                if prev is not None and mask_in is None:
                    prev_lr = jnp.reshape(
                        prev["pred_masks"],
                        (1, c.image_size // 4, c.image_size // 4))
                    mask_in = jnp.clip(prev_lr, -32.0, 32.0)[..., None]
                m, p, tp, v, pt, pv = self._build_memory(
                    state, frame_idx, idx, reverse)
                lr, hr, ious, obj_ptr, obj_logits = self._jit_correct(
                    self.params, fpn, pos_enc, (tuple(m),), (tuple(p),),
                    jnp.asarray(tp[None]), jnp.asarray(v[None]),
                    (tuple(pt),), jnp.asarray(pv[None]), coords, labels,
                    mask_in, multimask=multimask, has_points=has_points,
                    has_mask=mask_in is not None)
        out = {"pred_masks": lr[:, 0],
               "pred_masks_high_res": hr[:, 0],
               # f32: ptr slots must all share one dtype (see _encode_impl)
               "obj_ptr": obj_ptr[0].astype(jnp.float32)}
        storage = "cond" if is_cond else "non_cond"
        state["output_dict_per_obj"][idx][storage][frame_idx] = out
        if is_cond:
            state["output_dict_per_obj"][idx]["non_cond"].pop(frame_idx, None)
        state["dirty_prompt_frames"][frame_idx] = is_cond
        return out

    # -------------------------------------------------------------- tracking
    def _ensure_consts(self):
        c = self.cfg
        n_tok, mem_dim = self._n_feat, c.mem_dim
        if self._zero_tok is None or self._zero_tok.shape != (n_tok, mem_dim):
            self._zero_tok = jnp.zeros((n_tok, mem_dim), jnp.float32)
            self._tpos_host = np.asarray(
                self.params["maskmem_tpos_enc"], np.float32).reshape(
                c.num_maskmem, mem_dim)
        if self._zero_ptr is None or self._zero_ptr.shape != (c.hidden_dim,):
            self._zero_ptr = jnp.zeros((c.hidden_dim,), jnp.float32)

    @property
    def _track_multimask(self):
        c = self.cfg
        return bool(c.multimask_output_in_sam
                    and c.multimask_output_for_tracking
                    and c.multimask_min_pt_num <= 0 <= c.multimask_max_pt_num)

    def _scan_plan(self, state, run, reverse, video_res=False):
        """Return a generator tracking `run` (consecutive non-cond frames, in
        propagation order) via chunked scans — a partial last chunk is padded
        with -1 frame ids and runs through the same compiled scan — or None
        when the per-frame path must be used. Falls back when: scanning is
        disabled, the run is a single frame, frames are host-resident, the
        conditioning set overflows max_cond_frames_in_attn (the per-frame
        path then does per-frame closest-cond selection, _build_memory), or
        history_window is 0 (the caller wants every per-frame dict entry
        kept)."""
        c = self.cfg
        CH = self.scan_chunk
        n_obj = len(state["obj_id_to_idx"])
        if (not CH or CH < 2 or len(run) < 2 or n_obj == 0
                or c.num_maskmem < 2 or not self.history_window
                or isinstance(state["images"], np.ndarray)):
            return None
        conds = [state["output_dict_per_obj"][o]["cond"] for o in range(n_obj)]
        if (c.max_cond_frames_in_attn != -1
                and any(len(cd) > c.max_cond_frames_in_attn for cd in conds)):
            return None

        self._ensure_consts()
        f32 = jnp.float32
        n_tok, mem_dim = self._n_feat, c.mem_dim
        start = run[0]
        W, Pw = self._ring_W, max(c.max_obj_ptrs_in_encoder, 1)

        def tok(x):
            return jnp.reshape(x, (n_tok, mem_dim)).astype(f32)

        # --- conditioning rows (run constants; every step sees all of them,
        # selection is the identity because max_cond_frames_in_attn is -1 or
        # not binding — checked above)
        nc = max(len(cd) for cd in conds)
        cond_val = np.zeros((n_obj, nc), bool)
        cm_rows, cp_rows = [], []
        for o, cd in enumerate(conds):
            rm, rp = [], []
            for k, out in enumerate(cd.values()):
                if "maskmem_features" in out:
                    rm.append(tok(out["maskmem_features"]))
                    rp.append(tok(out["maskmem_pos_enc"]))
                    cond_val[o, k] = True
                else:
                    rm.append(self._zero_tok)
                    rp.append(self._zero_tok)
            rm += [self._zero_tok] * (nc - len(rm))
            rp += [self._zero_tok] * (nc - len(rp))
            cm_rows.append(rm)
            cp_rows.append(rp)
        shape_c = (n_obj, nc, n_tok, mem_dim)
        cond_mem = (jnp.stack([jnp.stack(r) for r in cm_rows])
                    if nc else jnp.zeros(shape_c, f32))
        cond_pos = (jnp.stack([jnp.stack(r) for r in cp_rows])
                    if nc else jnp.zeros(shape_c, f32))

        # --- conditioning obj-ptr rows (reference pool semantics: cond
        # pointers first, filtered to the past for eval; constant within a
        # run because runs never straddle a conditioning frame)
        pools = []
        for cd in conds:
            pool = []
            if c.use_obj_ptrs_in_encoder:
                for t0, out in cd.items():
                    if (c.only_obj_ptrs_in_the_past_for_eval
                            and not (t0 >= start if reverse else t0 <= start)):
                        continue
                    pool.append(out["obj_ptr"].astype(f32))
            pools.append(pool[: c.max_obj_ptrs_in_encoder])
        ncp = max(len(p) for p in pools)
        cond_ptr_val = np.zeros((n_obj, ncp), bool)
        for o, p in enumerate(pools):
            cond_ptr_val[o, : len(p)] = True
            pools[o] = p + [self._zero_ptr] * (ncp - len(p))
        cond_ptrs = (jnp.stack([jnp.stack(p) for p in pools]) if ncp
                     else jnp.zeros((n_obj, 0, c.hidden_dim), f32))

        # temporal-pos table: cond rows use t_pos=0, then t_pos=1..M-1
        # (matches _build_memory's tpos_host[num_maskmem - t_pos - 1] rows)
        M = c.num_maskmem
        tpos = np.concatenate(
            [np.repeat(self._tpos_host[M - 1][None], nc, axis=0)] +
            [self._tpos_host[M - t_pos - 1][None] for t_pos in range(1, M)])
        tpos_a = jnp.asarray(tpos)

        # --- seed the rings from any already-tracked frames in the lookback
        # window (e.g. a propagation restarted mid-video)
        ring_frame = np.full((W,), -1, np.int32)
        rm = [[self._zero_tok] * W for _ in range(n_obj)]
        rp = [[self._zero_tok] * W for _ in range(n_obj)]
        seedrange = (range(start + 1, start + W + 1) if reverse
                     else range(max(start - W, 0), start))
        for f in seedrange:
            outs = [state["output_dict_per_obj"][o]["non_cond"].get(f)
                    for o in range(n_obj)]
            if all(o is not None and "maskmem_features" in o for o in outs):
                s = f % W
                ring_frame[s] = f
                for o in range(n_obj):
                    rm[o][s] = tok(outs[o]["maskmem_features"])
                    rp[o][s] = tok(outs[o]["maskmem_pos_enc"])
        ring_mem = jnp.stack([jnp.stack(r) for r in rm])
        ring_pos = jnp.stack([jnp.stack(r) for r in rp])

        ptr_frame = np.full((Pw,), -1, np.int32)
        pr = [[self._zero_ptr] * Pw for _ in range(n_obj)]
        pseed = (range(start + 1, start + Pw + 1) if reverse
                 else range(max(start - Pw, 0), start))
        for f in pseed:
            outs = [state["output_dict_per_obj"][o]["non_cond"].get(f)
                    for o in range(n_obj)]
            if all(o is not None and "obj_ptr" in o for o in outs):
                s = f % Pw
                ptr_frame[s] = f
                for o in range(n_obj):
                    pr[o][s] = outs[o]["obj_ptr"].astype(f32)
        ptr_ring = jnp.stack([jnp.stack(p) for p in pr])

        carry = (ring_mem, ring_pos, jnp.asarray(ring_frame),
                 ptr_ring, jnp.asarray(ptr_frame))
        multimask = self._track_multimask
        keep = -(-self.history_window // CH) + 1

        def gen():
            nonlocal carry
            recent = []
            pend = None   # previous chunk's (frames, filled device array)
            wrote_back = False
            n_chunks = -(-len(run) // CH)
            try:
                for k in range(n_chunks):
                    chunk = run[k * CH:(k + 1) * CH]
                    # a partial tail chunk reuses the SAME compiled scan: pad
                    # the frame ids with -1 (runtime-skipped, _scan_impl)
                    ids_np = np.full((CH,), -1, np.int32)
                    ids_np[: len(chunk)] = chunk
                    ids = jnp.asarray(ids_np)
                    carry, outs = self._jit_scan(
                        self.params, state["images"], ids, *carry,
                        cond_mem, cond_pos, jnp.asarray(cond_val),
                        cond_ptrs, jnp.asarray(cond_ptr_val), tpos_a,
                        multimask=multimask, fill_area=c.fill_hole_area,
                        reverse=reverse)
                    recent.append((chunk, outs))
                    del recent[:-keep]
                    # chunk k yields only after chunk k+1 is dispatched, and
                    # as numpy views of ONE whole-chunk fetch: per-frame lazy
                    # slices would cost a slice RPC + a fetch RPC per frame
                    # over the remote link, serialized against an idle device
                    # (the next chunk isn't submitted until the consumer
                    # drains)
                    if pend is not None:
                        for t, m in zip(pend[0], np.asarray(pend[1])):
                            yield t, m
                    filled = outs[4]
                    if video_res:
                        filled = self._jit_video_res_chunk(
                            filled,
                            hw=(state["video_height"],
                                state["video_width"]),
                            nonoverlap=self.non_overlap_masks)
                    pend = (chunk, filled)
                # per-frame dict entries for the lookback tail, so the
                # per-frame path (partial last chunk, later propagate calls)
                # sees history; dispatched async BEFORE the final chunk's
                # fetch blocks on it
                self._scan_writeback(state, recent)
                wrote_back = True
                if pend is not None:
                    for t, m in zip(pend[0], np.asarray(pend[1])):
                        yield t, m
            finally:
                # a consumer abandoning the generator mid-run (break /
                # GC-close at a yield) must still get non_cond entries for
                # the frames already yielded, or a later correction click /
                # resumed propagate on them would see an empty memory bank
                if not wrote_back:
                    self._scan_writeback(state, recent)
        return gen()

    def _scan_writeback(self, state, recent):
        """Materialize per-frame non_cond entries (as lazy device slices) for
        the last history_window frames of a scan run, and prune older ones —
        the same bound the per-frame path enforces."""
        if not recent:
            return
        n_obj = len(state["obj_id_to_idx"])
        last = recent[-1][0][-1]
        w = self.history_window
        for chunk, (lr, obj_ptr, mem_feat, mem_pos, _) in recent:
            if all(abs(t - last) > w for t in chunk):
                continue
            lr_r, ptr_r, mf_r, mp_r = self._jit_unstack(
                lr, obj_ptr, mem_feat, mem_pos)
            for i, t in enumerate(chunk):
                if abs(t - last) > w:
                    continue
                for o in range(n_obj):
                    state["output_dict_per_obj"][o]["non_cond"][t] = {
                        "pred_masks": lr_r[i][o],
                        "obj_ptr": ptr_r[i][o],
                        "maskmem_features": mf_r[i][o],
                        "maskmem_pos_enc": mp_r[i][o],
                    }
        for o in range(n_obj):
            nc = state["output_dict_per_obj"][o]["non_cond"]
            for t in [t for t in nc if abs(t - last) > w]:
                del nc[t]

    def _propagate_run(self, state, run, reverse, video_res=False):
        """Track one maximal run of consecutive non-conditioning frames,
        yielding (frame_idx, filled mask logits [b, H, W]) — low-res by
        default, original video resolution when video_res is set (the scan
        path converts whole chunks on device; see _video_res_chunk_impl)."""
        scan = self._scan_plan(state, run, reverse, video_res)
        if scan is not None:
            yield from scan
            return
        for t in run:
            m = self._track_frame(state, t, reverse)
            if video_res:
                m = self.get_orig_video_res_output(state, m)[1]
            yield t, m

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
        # rows = cond frames + the num_maskmem-1 lookback slots (entries has
        # exactly that many; the scan path sizes its ring the same way)
        n_rows = max(1, len(entries))
        self._ensure_consts()
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

        lr, obj_ptr, mem_feat, mem_pos, filled = self._jit_track_fused(
            self.params, fpn, pos_enc, tuple(mems), tuple(poss),
            jnp.asarray(np.stack(tposs)), jnp.asarray(np.stack(valids)),
            tuple(ptrs), jnp.asarray(np.stack(ptr_valids)),
            multimask=self._track_multimask, fill_area=c.fill_hole_area)

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

    def _empty_mask_ptr(self, state, frame_idx, fpn):
        """Dummy object pointer from an empty mask on this frame (reference
        _get_empty_mask_ptr, :542-577) — fills pointer slots of objects that
        have no input or tracked output on a prompted frame."""
        c = self.cfg
        s = c.image_size
        if c.use_mask_input_as_output_without_sam:
            _, _, ptr, _ = self._jit_mask_as_output(
                self.params, fpn, jnp.zeros((1, s, s), jnp.float32))
        else:
            emb4 = c.sam_image_embedding_size * 4
            mask_in = jnp.zeros((1, emb4, emb4, 1), jnp.float32)
            _, _, _, ptr, _ = self._jit_cond(
                self.params, fpn, None, None, mask_in,
                multimask=False, has_points=False)
        return ptr[0].astype(jnp.float32)

    def _clear_non_cond_mem_around_input(self, state, frame_idx):
        """Drop non-conditioning memories within the maskmem lookback of a
        prompted frame (reference :954-975) so correction clicks aren't
        diluted by outdated surrounding appearance memories. Unlike the
        reference's literal range-pop, the prompted frame's OWN entry is
        kept: popping it would discard the just-consolidated correction
        output (a latent reference crash — its demo config only exercises
        this with add_all_frames_to_correct_as_cond, which stores the
        correction under cond and dodges the pop)."""
        c = self.cfg
        r = c.memory_temporal_stride_for_eval
        lo, hi = frame_idx - r * c.num_maskmem, frame_idx + r * c.num_maskmem
        for idx in range(len(state["obj_id_to_idx"])):
            nc = state["output_dict_per_obj"][idx]["non_cond"]
            for t in [t for t in nc if lo <= t <= hi and t != frame_idx]:
                del nc[t]

    def _should_clear_non_cond(self, state):
        return (self.clear_non_cond_mem_around_input
                and (self.clear_non_cond_mem_for_multi_obj
                     or len(state["obj_id_to_idx"]) <= 1))

    def propagate_in_video_preflight(self, state):
        """Consolidate newly-prompted frames before tracking (reference
        :579-646): for every dirty prompted frame, fill missing objects with
        NO_OBJ_SCORE placeholder masks and empty-mask pointers, then run the
        memory encoder over ALL objects' masks in one batch (with the
        cross-object non-overlap constraint if configured)."""
        state["tracking_has_started"] = True
        c = self.cfg
        n_obj = len(state["obj_id_to_idx"])
        hw = c.image_size // 4
        dirty = state["dirty_prompt_frames"]
        for t in sorted(dirty):
            is_cond = dirty[t]
            storage = "cond" if is_cond else "non_cond"
            fpn, pos_enc = self._get_features(state, t)
            # make sure every object with inputs on this frame is decoded
            # (add_new_* already did; this covers direct-state mutations)
            for idx in range(n_obj):
                outs = state["output_dict_per_obj"][idx]
                if (t not in outs["cond"] and t not in outs["non_cond"]
                        and (t in state["point_inputs_per_obj"][idx]
                             or t in state["mask_inputs_per_obj"][idx])):
                    self._decode_prompt_frame(state, t, idx, fpn, pos_enc)
            empty_ptr = None
            lrs = []
            for idx in range(n_obj):
                outs = state["output_dict_per_obj"][idx]
                out = outs[storage].get(
                    t, outs["cond"].get(t, outs["non_cond"].get(t)))
                if out is None:
                    # placeholder for an object without any input or output
                    # on this frame (reference :475-501)
                    if empty_ptr is None:
                        empty_ptr = self._empty_mask_ptr(state, t, fpn)
                    out = {"pred_masks": jnp.full((1, hw, hw), NO_OBJ_SCORE,
                                                  jnp.float32),
                           "obj_ptr": empty_ptr}
                    outs[storage][t] = out
                lrs.append(jnp.reshape(out["pred_masks"], (1, hw, hw)))
            if c.num_maskmem > 0 and n_obj > 0:
                nonoverlap = c.non_overlap_masks_for_mem_enc and n_obj > 1
                mem, pos = self._jit_consolidate_encode(
                    self.params, fpn, jnp.concatenate(lrs),
                    nonoverlap=nonoverlap)
                for idx in range(n_obj):
                    out = state["output_dict_per_obj"][idx][storage][t]
                    out["maskmem_features"] = mem[idx]
                    out["maskmem_pos_enc"] = pos[idx]
            state["consolidated_frame_inds"][storage].add(t)
            if is_cond:
                # an output promoted to cond evicts any prior non-cond
                # output on the same frame (reference :626-632)
                state["consolidated_frame_inds"]["non_cond"].discard(t)
                for idx in range(n_obj):
                    state["output_dict_per_obj"][idx]["non_cond"].pop(t, None)
            # applied for BOTH storage keys (reference :613-618)
            if self._should_clear_non_cond(state):
                self._clear_non_cond_mem_around_input(state, t)
        dirty.clear()

    def reset_state(self, state):
        """Remove all prompts, objects, and tracking results (reference
        :770-801); the uploaded frames and feature cache stay."""
        state["obj_id_to_idx"].clear()
        state["point_inputs_per_obj"].clear()
        state["mask_inputs_per_obj"].clear()
        state["output_dict_per_obj"].clear()
        state["frames_already_tracked"].clear()
        state["dirty_prompt_frames"].clear()
        state["consolidated_frame_inds"]["cond"].clear()
        state["consolidated_frame_inds"]["non_cond"].clear()
        state["tracking_has_started"] = False

    def get_orig_video_res_output(self, state, masks):
        """(low_res_masks, video_res_masks) at the original video resolution —
        reference _get_orig_video_res_output (:402-422). masks: [B, h, w]
        logits (device or numpy). The upsample (+ optional non_overlap_masks
        constraint) runs on device; the result is a lazy device array so a
        consumer that only thresholds a crop doesn't pay a full-res fetch."""
        masks = jnp.asarray(masks)
        hw = (state["video_height"], state["video_width"])
        if masks.shape[-2:] == hw and not self.non_overlap_masks:
            return masks, masks
        return masks, self._jit_video_res(masks, hw=hw,
                                          nonoverlap=self.non_overlap_masks)

    def propagate_in_video(self, state, start_frame_idx=None,
                           max_frame_num_to_track=None, reverse=False,
                           output_video_res=False):
        """Generator over (frame_idx, obj_ids, mask logits [B, H, W]).

        Default yields are LOW-RES (image_size/4) logits — the TPU-first
        contract: tracked frames come out of the chunked scan as one
        whole-chunk fetch, and most consumers (eval IoU, matching) score at
        low res anyway (fetching 16x fewer bytes over a remote link).
        output_video_res=True matches the reference's yield exactly
        (video-resolution upsample + optional non-overlap, :724-739): the
        upsample runs on device — whole chunks at a time on the scan path
        (yielded as numpy views of one chunk fetch), lazy device arrays on
        the per-frame paths."""
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
        inds = state["consolidated_frame_inds"]
        prompted = inds["cond"] | inds["non_cond"]
        ts = list(rng)
        i = 0
        while i < len(ts):
            t = ts[i]
            if t in prompted:
                # prompted frames keep their consolidated outputs (reference
                # :695-705): stored per object under cond or non_cond
                rows = []
                for k in range(len(obj_ids)):
                    outs = state["output_dict_per_obj"][k]
                    out = outs["cond"].get(t, outs["non_cond"].get(t))
                    rows.append(
                        jnp.reshape(out["pred_masks"], (hw, hw)) if out
                        is not None else
                        jnp.full((hw, hw), NO_OBJ_SCORE, jnp.float32))
                masks = jnp.stack(rows)
                if self.cfg.fill_hole_area > 0:
                    masks = fill_holes_in_mask_scores(
                        masks, self.cfg.fill_hole_area)
                if t in inds["cond"] and self._should_clear_non_cond(state):
                    self._clear_non_cond_mem_around_input(state, t)
                state["frames_already_tracked"][t] = {"reverse": reverse}
                if output_video_res:
                    masks = self.get_orig_video_res_output(state, masks)[1]
                yield t, obj_ids, masks
                i += 1
                continue
            # maximal run of consecutive non-prompted frames: tracked by
            # chunked device scans when eligible, per-frame otherwise
            # (_propagate_run). Per-frame yields are lazy device arrays
            # (fetching here would fence every frame on the submit->fetch
            # round trip; streaming consumers overlap the fetch with the next
            # frame's compute); scan chunks yield numpy views of one
            # whole-chunk fetch that already overlapped the next chunk.
            j = i
            while j < len(ts) and ts[j] not in prompted:
                j += 1
            for t2, masks in self._propagate_run(state, ts[i:j], reverse,
                                                 output_video_res):
                state["frames_already_tracked"][t2] = {"reverse": reverse}
                yield t2, obj_ids, masks
            i = j
