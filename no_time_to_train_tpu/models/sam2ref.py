"""SAM2Ref — the legacy trainable variant (reference
no_time_to_train/models/SAM2Ref.py): a frozen SAM2 plus a learnable custom-IoU
head trained to regress oracle mask IoU, with reference images injected
through SAM2's memory attention.

Trainable parameters (reference :51-64):
  - mem_feat_ref_pe [mem_dim]: additive PE marking reference memories;
  - iou_embed [1, C]: the custom IoU token appended to sparse prompts
    (hidden from image->token cross-attn via skip_last_n_keys=2);
  - iou_prediction_head: MLP(C, 256, 4, 3, sigmoid).

TPU design: fixed-shape batches — (item, category) pairs flattened to a G
axis with validity; refs padded to R per category; GT instances padded to
I_max. The whole train step (two encoder passes, memory fusion, P-point
decode, matched-IoU targets, L1 loss, grads for the 3 trainable leaves) is
one jit.
"""
from dataclasses import dataclass
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.sam2.common import MLP
from no_time_to_train_tpu.ops.masks import batched_mask_to_box
from no_time_to_train_tpu.ops.nms import batched_nms, take_first_kept


class RefHeads(nn.Module):
    """The trainable leaves, as a flax module for init/apply ergonomics."""
    transformer_dim: int
    mem_dim: int
    num_mask_tokens: int = 4
    iou_head_hidden: int = 256
    iou_head_depth: int = 3

    def setup(self):
        self.mem_feat_ref_pe = self.param("mem_feat_ref_pe",
                                          nn.initializers.normal(0.02),
                                          (self.mem_dim,))
        self.iou_embed = self.param("iou_embed", nn.initializers.normal(0.02),
                                    (1, self.transformer_dim))
        self.iou_prediction_head = MLP(self.iou_head_hidden,
                                       self.num_mask_tokens,
                                       self.iou_head_depth,
                                       sigmoid_output=True,
                                       name="iou_prediction_head")

    def __call__(self, token_out):
        return self.iou_prediction_head(token_out)


@dataclass
class Sam2RefConfig:
    skip_custom_iou_in_attn: bool = True
    semantic_ref: bool = True
    n_categories: int = 20
    memory_length: int = 1
    testing_point_bs: int = 256
    testing_nms_iou_thr: float = 0.7
    testing_out_num: int = 100

    @property
    def n_skip_tokens_in_attn(self):
        # add_semantic_token=False (+1) and custom iou token present (+1)
        return 2 if self.skip_custom_iou_in_attn else 0


class SAM2Ref:
    def __init__(self, sam2: SAM2, sam2_params, cfg: Sam2RefConfig = None,
                 seed=0):
        self.sam2 = sam2
        self.sam2_params = jax.device_put(jax.tree.map(jnp.asarray,
                                                       sam2_params))
        self.cfg = cfg or Sam2RefConfig()
        c = sam2.cfg
        self.heads = RefHeads(c.hidden_dim, c.mem_dim)
        key = jax.random.PRNGKey(seed)
        self.head_params = self.heads.init(
            key, jnp.zeros((1, c.hidden_dim)))["params"]
        mem_hw = c.sam_image_embedding_size
        self.mem_feat_size = mem_hw * mem_hw
        # raw-tensor memory bank (reference buffers :92-117)
        self.memory_bank = jnp.zeros(
            (self.cfg.n_categories, self.cfg.memory_length,
             self.mem_feat_size, c.mem_dim))
        self.memory_pe = jnp.zeros((self.mem_feat_size, c.mem_dim))
        self.memory_fill = jnp.zeros((self.cfg.n_categories,), jnp.int32)
        self._train_step_jit = None
        self._jit_fill = jax.jit(self._encode_reference_memory)
        self._jit_test = jax.jit(self._forward_test_impl)

    # ------------------------------------------------------------ internals
    def _apply(self, method, *args, **kw):
        return self.sam2.apply({"params": self.sam2_params}, *args,
                               method=method, **kw)

    def _encode_reference_memory(self, sam2_params, ref_imgs, ref_masks):
        """refs -> memory features via mask-as-output + force-binarized
        memory encoder (reference _forward_references :214-250, semantic path)."""
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        out = self.sam2.apply({"params": sam2_params},
                              _normalize(ref_imgs),
                              method=self.sam2.forward_image)
        pix = out["backbone_fpn"][-1]
        high_res_masks = ref_masks.astype(jnp.float32) * 20.0 - 10.0
        mem_feat, mem_pos = self.sam2.apply(
            {"params": sam2_params}, pix, high_res_masks[..., None], False,
            True, method=self.sam2.encode_memory)
        return mem_feat, mem_pos

    def _fuse_with_memory(self, sam2_params, head_params, tar_flat, tar_pe,
                          memory, memory_pos, memory_valid=None):
        """Memory attention with the reference-marking PE added
        (reference _forward_memory_* :252-349)."""
        pe = head_params["mem_feat_ref_pe"]
        return self.sam2.apply(
            {"params": sam2_params}, tar_flat, tar_pe,
            memory, memory_pos + pe, 0, memory_valid,
            method=self.sam2.memory_conditioned_features)

    def _decode_with_custom_iou(self, sam2_params, head_params, pix, hr,
                                coords, labels):
        """Decoder with the custom IoU token appended to sparse prompts and
        hidden from cross-attn (reference _forward_decoder_testing :351-410)."""
        def run(m):
            sparse, dense = m.sam_prompt_encoder(points=(coords, labels))
            tok = jnp.broadcast_to(head_params["iou_embed"][None],
                                   (sparse.shape[0], 1,
                                    sparse.shape[-1])).astype(sparse.dtype)
            sparse = jnp.concatenate([sparse, tok], axis=1)
            return m.sam_mask_decoder(
                image_embeddings=pix,
                image_pe=m.sam_prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=True, repeat_image=False,
                high_res_features=hr, return_iou_token_out=True,
                disable_custom_iou_embed=False, output_all_masks=True,
                skip_last_n_keys=self.cfg.n_skip_tokens_in_attn)

        masks, ious, _, _, my_token = self.sam2.apply(
            {"params": sam2_params}, method=run)
        custom_iou = self.heads.apply({"params": head_params}, my_token)
        return masks.astype(jnp.float32), ious, custom_iou

    # ---------------------------------------------------------------- train
    def train_loss(self, head_params, sam2_params, batch):
        """batch: tar_imgs [G, S, S, 3] (target per (item,cat) pair),
        ref_imgs [G, R, S, S, 3], ref_masks [G, R, S, S],
        query_points [G, P, 2], gt_masks [G, I, S4, S4] bool,
        gt_valid [G, I], cat_valid [G]. Returns (loss, metrics)."""
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        c = self.sam2.cfg
        g, r = batch["ref_imgs"].shape[:2]
        p = batch["query_points"].shape[1]
        s = c.image_size
        hw = c.sam_image_embedding_size

        # encode targets
        t_out = self.sam2.apply({"params": sam2_params},
                                _normalize(batch["tar_imgs"]),
                                method=self.sam2.forward_image)
        fpn = t_out["backbone_fpn"]
        pos = t_out["vision_pos_enc"][-1]
        tar_flat = fpn[-1].reshape(g, hw * hw, c.d_model)
        pe_flat = pos.reshape(g, hw * hw, c.d_model)

        # reference memories
        mem_feat, mem_pos = self._encode_reference_memory(
            sam2_params, batch["ref_imgs"].reshape(g * r, s, s, 3),
            batch["ref_masks"].reshape(g * r, s, s))
        mem_dim = mem_feat.shape[-1]
        mem = mem_feat.reshape(g, r * self.mem_feat_size, mem_dim)
        mpos = mem_pos.reshape(g, r * self.mem_feat_size, mem_dim)

        fused = self._fuse_with_memory(sam2_params, head_params, tar_flat,
                                       pe_flat, mem, mpos)
        fused = fused.reshape(g, hw, hw, c.d_model)

        # decode every query point (flatten G*P)
        pix = jnp.repeat(fused, p, axis=0)
        hr = [jnp.repeat(fpn[0], p, axis=0), jnp.repeat(fpn[1], p, axis=0)] \
            if c.use_high_res_features_in_sam else None
        coords = batch["query_points"].reshape(g * p, 1, 2)
        labels = jnp.ones((g * p, 1), jnp.int32)
        masks, ious, custom_iou = self._decode_with_custom_iou(
            sam2_params, head_params, pix, hr, coords, labels)
        # masks [G*P, 4, 256, 256]; custom_iou [G*P, 4]

        # matched oracle IoU (reference _compute_matched_iou_matrix :138-157)
        pred = (masks > 0).reshape(g, p * 4, -1)
        gt = batch["gt_masks"].reshape(g, -1, pred.shape[-1]).astype(bool)
        inter = jnp.einsum("gqn,gin->gqi", pred.astype(jnp.float32),
                           gt.astype(jnp.float32))
        area_p = pred.sum(-1)[:, :, None]
        area_g = gt.sum(-1)[:, None, :]
        union = area_p + area_g - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        iou = jnp.where(batch["gt_valid"][:, None, :], iou, -1.0)
        matched = jnp.clip(iou.max(axis=-1), 0.0)

        w = jnp.repeat(batch["cat_valid"].astype(jnp.float32), p * 4)
        err = jnp.abs(matched.reshape(-1) - custom_iou.reshape(-1))
        loss = (err * w).sum() / jnp.maximum(w.sum(), 1.0)
        # matched/pred exposed for held-out ranking evaluation
        # (tests/test_sam2ref.py convergence test)
        metrics = {"mean_seg_iou":
                   (matched.reshape(-1) * w).sum() / jnp.maximum(w.sum(), 1.0),
                   "matched_iou": matched.reshape(-1),
                   "pred_iou": custom_iou.reshape(-1),
                   "weight": w}
        return loss, metrics

    def make_optimizer(self, base_lr=1e-4, weight_decay=0.05,
                       warmup_iters=500, decay_steps=(), world_size=1,
                       base_bs=8, train_bs=8):
        """AdamW with no-decay split + linear warmup + multi-step 0.1 decay,
        lr scaled by total batch size (reference sam2ref_pl.py:145-185)."""
        lr = base_lr * (train_bs * world_size) / base_bs

        def schedule(step):
            warm = jnp.minimum(1.0, (step + 1) / max(warmup_iters, 1))
            decay = jnp.asarray(1.0)
            for d in decay_steps:
                decay = decay * jnp.where(step >= d, 0.1, 1.0)
            return lr * warm * decay

        def decay_mask(params):
            def is_decay(path, _):
                name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
                return not any(t in name for t in
                               ("norm", "bn", "ln", "bias", "pe", "embed"))
            return jax.tree_util.tree_map_with_path(is_decay, params)

        return optax.chain(
            optax.adamw(schedule, weight_decay=weight_decay,
                        mask=decay_mask))

    def make_train_step(self, optimizer):
        from no_time_to_train_tpu.ops.upscale_product import no_fusion

        @jax.jit
        def step(head_params, opt_state, batch):
            # the fused Pallas decode kernels have no autodiff rules; trace
            # the differentiated decode through the XLA formulations
            with no_fusion():
                (loss, metrics), grads = jax.value_and_grad(
                    self.train_loss, has_aux=True)(
                        head_params, self.sam2_params, batch)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  head_params)
            head_params = optax.apply_updates(head_params, updates)
            return head_params, opt_state, loss, metrics
        return step

    # ----------------------------------------------------------- fill / test
    def fill_memory(self, cat_ind, ref_imgs, ref_masks):
        """One category's references -> bank slot (reference
        forward_fill_memory :598-648; the cross-rank all_gather lives in
        parallel/mesh.py)."""
        mem_feat, mem_pos = self._jit_fill(self.sam2_params,
                                           jnp.asarray(ref_imgs),
                                           jnp.asarray(ref_masks))
        feat = mem_feat.reshape(-1, self.mem_feat_size, mem_feat.shape[-1])
        slot = int(self.memory_fill[cat_ind])
        self.memory_bank = self.memory_bank.at[cat_ind, slot].set(feat[0])
        self.memory_pe = mem_pos.reshape(-1, self.mem_feat_size,
                                         mem_pos.shape[-1])[0]
        self.memory_fill = self.memory_fill.at[cat_ind].add(1)

    def _forward_test_impl(self, sam2_params, head_params, memory_bank,
                           memory_pe, tar_img, points):
        """Per-category memory fusion + grid decode with custom-IoU ranking
        (reference _forward_memory_testing :303-349 + forward_test :650-775)."""
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        c = self.sam2.cfg
        n_cat, length = memory_bank.shape[:2]
        hw = c.sam_image_embedding_size

        out = self.sam2.apply({"params": sam2_params},
                              _normalize(tar_img)[None],
                              method=self.sam2.forward_image)
        fpn = out["backbone_fpn"]
        pos = out["vision_pos_enc"][-1]
        tar_flat = jnp.broadcast_to(
            fpn[-1].reshape(1, hw * hw, c.d_model),
            (n_cat, hw * hw, c.d_model))
        pe_flat = jnp.broadcast_to(
            pos.reshape(1, hw * hw, c.d_model), (n_cat, hw * hw, c.d_model))

        mem = memory_bank.reshape(n_cat, -1, memory_bank.shape[-1])
        mpe = jnp.broadcast_to(memory_pe[None, None],
                               (n_cat, length) + memory_pe.shape
                               ).reshape(n_cat, -1, memory_pe.shape[-1])
        fused = self._fuse_with_memory(sam2_params, head_params, tar_flat,
                                       pe_flat, mem, mpe)
        fused = fused.reshape(n_cat, hw, hw, c.d_model)

        n_pts = points.shape[0]
        chunk = min(self.cfg.testing_point_bs, n_pts)
        pts = points.reshape(n_pts // chunk, chunk, 1, 2)

        def decode_cat_chunk(args):
            pix_c, pc = args
            labels = jnp.ones((chunk, 1), jnp.int32)
            pix_b = jnp.broadcast_to(pix_c[None], (chunk,) + pix_c.shape)
            masks, ious, custom = self._decode_with_custom_iou(
                sam2_params, head_params, pix_b, [fpn[0], fpn[1]], pc, labels)
            score = ious * custom
            best = jnp.argmax(score, axis=-1)
            bi = jnp.arange(chunk)
            return masks[bi, best], score[bi, best]

        def decode_cat(pix_c):
            m, s = jax.lax.map(lambda pc: decode_cat_chunk((pix_c, pc)), pts)
            return m.reshape(n_pts, *m.shape[-2:]), s.reshape(-1)

        masks, scores = jax.lax.map(decode_cat, fused)
        masks = masks.reshape(n_cat * n_pts, *masks.shape[-2:])
        scores = scores.reshape(-1)
        labels_out = jnp.repeat(jnp.arange(n_cat), n_pts)

        boxes = batched_mask_to_box(masks > 0).astype(jnp.float32)
        order, keep = batched_nms(boxes, scores, labels_out,
                                  jnp.ones_like(scores, bool),
                                  self.cfg.testing_nms_iou_thr)
        sel, sel_valid = take_first_kept(order, keep,
                                         self.cfg.testing_out_num)
        return dict(lr_logits=masks[sel].astype(jnp.float16),
                    scores=jnp.where(sel_valid, scores[sel], 0.0),
                    labels=labels_out[sel], valid=sel_valid)

    def forward_test(self, tar_img, points_per_side=32):
        from no_time_to_train_tpu.models.matching.pipeline import grid_points
        pts = grid_points(points_per_side, self.sam2.cfg.image_size)
        out = self._jit_test(self.sam2_params, self.head_params,
                             self.memory_bank, self.memory_pe,
                             jnp.asarray(tar_img), pts)
        return jax.tree.map(np.asarray, out)
