"""SAM2 assembly (reference sam2/modeling/sam2_base.py:SAM2Base, flax).

Exposes the pieces the NTTT pipeline needs as flax methods:
  - forward_image: Hiera + FPN (+ conv_s0/s1 pre-projection, sam2_base.py:509-521)
  - forward_sam_heads: prompt encoder + mask decoder (sam2_base.py:251-455)
  - encode_memory / memory_conditioned_features: video-memory path
    (sam2_base.py:539-760)

All image tensors NHWC; mask logits [B, M, H, W].
"""
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.config.presets import Sam2Config
from no_time_to_train_tpu.models.sam2.hiera import Hiera
from no_time_to_train_tpu.models.sam2.neck import FpnNeck, ImageEncoder
from no_time_to_train_tpu.models.sam2.prompt_encoder import PromptEncoder
from no_time_to_train_tpu.models.sam2.mask_decoder import MaskDecoder
from no_time_to_train_tpu.models.sam2.memory_encoder import MemoryEncoder
from no_time_to_train_tpu.models.sam2.memory_attention import MemoryAttention
from no_time_to_train_tpu.models.sam2.common import MLP
from no_time_to_train_tpu.ops.resize import resize_hw

NO_OBJ_SCORE = -1024.0


class Sam2ImageEncoder(nn.Module):
    cfg: Sam2Config
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"   # "int8": W8A8 Hiera block GEMMs (ops/quant.py)

    def setup(self):
        c = self.cfg
        self.trunk = Hiera(
            embed_dim=c.embed_dim, num_heads=c.num_heads, stages=c.stages,
            global_att_blocks=c.global_att_blocks,
            window_pos_embed_bkg_spatial_size=c.window_pos_embed_bkg_spatial_size,
            window_spec=c.window_spec, name="trunk", dtype=self.dtype,
            quant=self.quant)
        self.neck = FpnNeck(
            d_model=c.d_model, backbone_channel_list=list(c.backbone_channel_list),
            num_pos_feats=c.d_model, fpn_top_down_levels=list(c.fpn_top_down_levels),
            fpn_interp_model=c.fpn_interp_model, name="neck", dtype=self.dtype)

    def __call__(self, sample):
        features, pos = self.neck(self.trunk(sample))
        if self.cfg.scalp > 0:
            features = features[: -self.cfg.scalp]
            pos = pos[: -self.cfg.scalp]
        return {"vision_features": features[-1], "vision_pos_enc": pos,
                "backbone_fpn": features}


class SAM2(nn.Module):
    cfg: Sam2Config
    dtype: jnp.dtype = jnp.float32
    encoder_quant: str = "none"   # image-encoder (Hiera) GEMMs only; the
    # prompt/mask towers always stay in the compute dtype (tiny GEMMs,
    # directly feed mask/IoU regression)

    def setup(self):
        c = self.cfg
        self.image_encoder = Sam2ImageEncoder(c, name="image_encoder",
                                              dtype=self.dtype,
                                              quant=self.encoder_quant)
        emb = c.sam_image_embedding_size
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=c.hidden_dim, image_embedding_size=(emb, emb),
            input_image_size=(c.image_size, c.image_size), mask_in_chans=16,
            name="sam_prompt_encoder", dtype=self.dtype)
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=c.hidden_dim, num_multimask_outputs=3,
            iou_head_depth=3, iou_head_hidden_dim=256,
            use_high_res_features=c.use_high_res_features_in_sam,
            iou_prediction_use_sigmoid=c.iou_prediction_use_sigmoid,
            dynamic_multimask_via_stability=c.dynamic_multimask_via_stability,
            dynamic_multimask_stability_delta=c.dynamic_multimask_stability_delta,
            dynamic_multimask_stability_thresh=c.dynamic_multimask_stability_thresh,
            pred_obj_scores=c.pred_obj_scores,
            pred_obj_scores_mlp=c.pred_obj_scores_mlp,
            use_multimask_token_for_obj_ptr=c.use_multimask_token_for_obj_ptr,
            name="sam_mask_decoder", dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(
            out_dim=c.mem_enc_out_dim, in_dim=c.d_model, pos_num_feats=64,
            mask_downsampler_kwargs=dict(kernel_size=3, stride=2, padding=1),
            name="memory_encoder", dtype=self.dtype)
        self.memory_attention = MemoryAttention(
            d_model=c.d_model, num_layers=c.mem_attn_layers,
            pos_enc_at_input=True,
            layer_kwargs=dict(dim_feedforward=c.mem_attn_dim_feedforward,
                              cross_kv_in_dim=c.mem_dim,
                              rope_feat_sizes=c.rope_feat_sizes),
            name="memory_attention", dtype=self.dtype)

        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (c.num_maskmem, c.mem_dim))
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (c.hidden_dim,))
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.normal(0.02), (c.hidden_dim,))
        if c.pred_obj_scores and c.use_obj_ptrs_in_encoder:
            self.no_obj_ptr = self.param(
                "no_obj_ptr", nn.initializers.normal(0.02), (c.hidden_dim,))
        if c.use_obj_ptrs_in_encoder:
            if c.use_mlp_for_obj_ptr_proj:
                self.obj_ptr_proj = MLP(c.hidden_dim, c.hidden_dim, 3,
                                        name="obj_ptr_proj", dtype=self.dtype)
            else:
                self.obj_ptr_proj = nn.Dense(c.hidden_dim, name="obj_ptr_proj",
                                             dtype=self.dtype)
            self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4),
                                           name="mask_downsample",
                                           dtype=self.dtype)

    def init_everything(self, imgs):
        """Touch every submodule once so `init` creates the full param tree
        (used only for random-weight initialization; real runs convert torch
        checkpoints)."""
        c = self.cfg
        out = self.forward_image(imgs)
        fpn = out["backbone_fpn"]
        heads = self.forward_sam_heads(
            fpn[-1], jnp.zeros((1, 1, 2), jnp.float32),
            jnp.ones((1, 1), jnp.int32), None,
            [fpn[0], fpn[1]] if c.use_high_res_features_in_sam else None,
            True)
        s = c.image_size
        mem_feat, mem_pos = self.encode_memory(
            fpn[-1], jnp.zeros((1, s, s, 1)), True)
        n = fpn[-1].shape[1] * fpn[-1].shape[2]
        curr = fpn[-1].reshape(1, n, c.d_model)
        fused = self.memory_conditioned_features(
            curr, curr, mem_feat.reshape(1, -1, mem_feat.shape[-1]),
            mem_pos.reshape(1, -1, mem_pos.shape[-1]))
        # mask prompt path (mask_downscaling convs) + mask_downsample
        emb = c.sam_image_embedding_size
        self.sam_prompt_encoder(
            points=None, masks=jnp.zeros((1, emb * 4, emb * 4, 1)))
        if c.use_obj_ptrs_in_encoder:
            self.mask_downsample(jnp.zeros((1, s, s, 1), self.dtype))
        _ = self.no_mem_features(curr)
        return heads[0]

    # ------------------------------------------------------------------ image
    def forward_image(self, imgs):
        """imgs: [B, H, W, 3] normalized. Returns dict with `backbone_fpn`
        [3 NHWC levels, conv_s0/s1 pre-applied to levels 0/1] and
        `vision_pos_enc`."""
        out = self.image_encoder(imgs)
        if self.cfg.use_high_res_features_in_sam:
            fpn = list(out["backbone_fpn"])
            fpn[0] = self.sam_mask_decoder.conv_s0(fpn[0])
            fpn[1] = self.sam_mask_decoder.conv_s1(fpn[1])
            out["backbone_fpn"] = fpn
        return out

    def get_dense_pe(self):
        return self.sam_prompt_encoder.get_dense_pe()

    # ------------------------------------------------------------------ heads
    def forward_sam_heads(self, backbone_features, point_coords=None,
                          point_labels=None, mask_inputs=None,
                          high_res_features=None, multimask_output=False,
                          output_all_masks=False):
        """Batched SAM heads (sam2_base.py:251-455), static shapes.

        backbone_features: [B or 1, h, w, C]; point_coords [B, P, 2];
        point_labels [B, P]; mask_inputs [B, 4h, 4w, 1] already at the prompt
        encoder's mask size (caller pre-resizes).
        """
        c = self.cfg
        if point_coords is None:
            b = backbone_features.shape[0]
            point_coords = jnp.zeros((b, 1, 2), jnp.float32)
            point_labels = -jnp.ones((b, 1), jnp.int32)
        sparse, dense = self.sam_prompt_encoder(
            points=(point_coords, point_labels), masks=mask_inputs)
        dec = self.sam_mask_decoder(
            image_embeddings=backbone_features,
            image_pe=self.sam_prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=multimask_output,
            repeat_image=False,
            high_res_features=high_res_features,
            disable_custom_iou_embed=True,
            disable_mlp_obj_scores=True,
            output_all_masks=output_all_masks)
        low_res_multimasks, ious, sam_output_tokens, object_score_logits = dec

        if c.pred_obj_scores and not output_all_masks:
            is_obj = object_score_logits > 0
            low_res_multimasks = jnp.where(is_obj[:, :, None, None],
                                           low_res_multimasks, NO_OBJ_SCORE)
        low_res_multimasks = low_res_multimasks.astype(jnp.float32)

        if output_all_masks:
            return low_res_multimasks, ious, sam_output_tokens, object_score_logits

        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            bi = jnp.arange(ious.shape[0])
            low_res_masks = low_res_multimasks[bi, best][:, None]
            sam_output_token = (sam_output_tokens[bi, best]
                                if sam_output_tokens.shape[1] > 1
                                else sam_output_tokens[:, 0])
        else:
            low_res_masks = low_res_multimasks
            sam_output_token = sam_output_tokens[:, 0]

        high_res_masks = resize_hw(low_res_masks, (c.image_size, c.image_size),
                                   mode="bilinear")
        obj_ptr = self.obj_ptr_proj(sam_output_token)
        if c.pred_obj_scores:
            lam = (nn.sigmoid(object_score_logits) if c.soft_no_obj_ptr
                   else (object_score_logits > 0).astype(obj_ptr.dtype))
            if c.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr
        return (low_res_masks, high_res_masks, ious, obj_ptr,
                object_score_logits)

    def prompt_embeddings(self, point_coords, point_labels):
        """Prompt-encoder outputs for the factored grid decoder (see
        models/sam2/factored_decode.py): (sparse [B, Ts, C],
        no-mask dense [1, h, w, C], dense positional encoding [h, w, C])."""
        sparse, _ = self.sam_prompt_encoder(
            points=(point_coords, point_labels))
        return (sparse, self.sam_prompt_encoder.no_mask_dense(),
                self.sam_prompt_encoder.get_dense_pe())

    def forward_sam_heads_best(self, backbone_features, point_coords,
                               point_labels, high_res_features=None):
        """Fused grid-decode: best-of-multimask selected inside the decoder
        (see MaskDecoder.predict_best_of_multimask). Returns
        (mask [B, 4h, 4w] in the COMPUTE dtype, iou [B]). The dense
        (no-mask) embedding stays at batch 1 so the image side of the
        two-way transformer is shared across prompts until it genuinely
        diverges. The mask stays bf16 on TPU: every consumer binarizes (>0,
        exact) or casts to fp16 (exact from bf16), and the old f32
        up-conversion wrote an extra 256 MB/step of mask planes
        (~1.7 ms/step profiled)."""
        sparse, _ = self.sam_prompt_encoder(
            points=(point_coords, point_labels))
        dense1 = self.sam_prompt_encoder.no_mask_dense()
        mask, iou = self.sam_mask_decoder.predict_best_of_multimask(
            backbone_features, self.sam_prompt_encoder.get_dense_pe(),
            sparse, dense1, repeat_image=False,
            high_res_features=high_res_features)
        return mask, iou

    # ----------------------------------------------------------------- memory
    def encode_memory(self, pix_feat, pred_masks_high_res, is_mask_from_pts,
                      force_binarize=False):
        """sam2_base.py:718-760. pix_feat [B, h, w, C] NHWC; masks
        [B, H, W, 1] logits at image resolution."""
        c = self.cfg
        binarize = c.binarize_mask_from_pts_for_mem_enc and is_mask_from_pts
        if force_binarize or binarize:
            mask_for_mem = (pred_masks_high_res > 0).astype(self.dtype)
        else:
            mask_for_mem = nn.sigmoid(pred_masks_high_res)
        mask_for_mem = (mask_for_mem * c.sigmoid_scale_for_mem_enc
                        + c.sigmoid_bias_for_mem_enc)
        out = self.memory_encoder(pix_feat, mask_for_mem, skip_mask_sigmoid=True)
        return out["vision_features"], out["vision_pos_enc"][0]

    def memory_conditioned_features(self, curr_feat, curr_pos, memory,
                                    memory_pos, num_obj_ptr_tokens=0,
                                    memory_valid=None):
        """Memory attention fusion; curr_feat/curr_pos [B, N, C], memory
        [B, M, mem_dim]; memory_valid [B, M] masks padded fixed-shape slots."""
        return self.memory_attention(curr_feat, curr_pos, memory, memory_pos,
                                     num_obj_ptr_tokens=num_obj_ptr_tokens,
                                     memory_valid=memory_valid)

    def no_mem_features(self, curr_feat):
        """directly_add_no_mem_embed path (sam2_base.py:685-689)."""
        return curr_feat + self.no_mem_embed.astype(curr_feat.dtype)
