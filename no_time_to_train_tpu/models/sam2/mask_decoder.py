"""SAM2 mask decoder with the NTTT extensions (reference
sam2/modeling/sam/mask_decoder.py): `output_all_masks`, `skip_last_n_keys`,
`return_iou_token_out` / `disable_custom_iou_embed` (custom IoU token path used
by the SAM2Ref trainable variant).

Note: in the vendored reference, `predict_masks` computes object_score_logits
as a constant 10.0 (the MLP head is dead code guarded by `and False`,
mask_decoder.py:276-281); we reproduce that behavior while still carrying the
`pred_obj_score_head` parameters for checkpoint compatibility.
"""
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.common import (
    MLP, LayerNorm2dP, conv_transpose_2x2_s2, ACT)
from no_time_to_train_tpu.models.sam2.transformer import TwoWayTransformer


class MaskDecoder(nn.Module):
    transformer_dim: int
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = False
    iou_prediction_use_sigmoid: bool = False
    dynamic_multimask_via_stability: bool = False
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    pred_obj_scores: bool = False
    pred_obj_scores_mlp: bool = False
    use_multimask_token_for_obj_ptr: bool = False
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    def setup(self):
        d = self.transformer_dim
        self.transformer = TwoWayTransformer(
            depth=self.transformer_depth, embedding_dim=d,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim, name="transformer",
            dtype=self.dtype)
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                                    (1, d))
        self.mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                      (self.num_mask_tokens, d))
        if self.pred_obj_scores:
            self.obj_score_token = self.param(
                "obj_score_token", nn.initializers.normal(1.0), (1, d))

        # output upscaling deconvs stored in torch layout [c_in, c_out, 2, 2]
        self.upscale_dc1_kernel = self.param(
            "output_upscaling_0_weight", nn.initializers.lecun_normal(),
            (d, d // 4, 2, 2))
        self.upscale_dc1_bias = self.param(
            "output_upscaling_0_bias", nn.initializers.zeros, (d // 4,))
        self.upscale_ln = LayerNorm2dP(d // 4, name="output_upscaling_1",
                                       dtype=self.dtype)
        self.upscale_dc2_kernel = self.param(
            "output_upscaling_3_weight", nn.initializers.lecun_normal(),
            (d // 4, d // 8, 2, 2))
        self.upscale_dc2_bias = self.param(
            "output_upscaling_3_bias", nn.initializers.zeros, (d // 8,))

        if self.use_high_res_features:
            self.conv_s0 = nn.Conv(d // 8, (1, 1), name="conv_s0", dtype=self.dtype)
            self.conv_s1 = nn.Conv(d // 4, (1, 1), name="conv_s1", dtype=self.dtype)

        self.hyper_mlps = [
            MLP(d, d // 8, 3, name=f"output_hypernetworks_mlps_{i}",
                dtype=self.dtype)
            for i in range(self.num_mask_tokens)]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim, self.num_mask_tokens, self.iou_head_depth,
            sigmoid_output=self.iou_prediction_use_sigmoid,
            name="iou_prediction_head", dtype=self.dtype)
        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                self.pred_obj_score_head = MLP(d, 1, 3,
                                               name="pred_obj_score_head",
                                               dtype=self.dtype)
            else:
                self.pred_obj_score_head = nn.Dense(1, name="pred_obj_score_head",
                                                    dtype=self.dtype)

    def predict_masks(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                      dense_prompt_embeddings, repeat_image,
                      high_res_features=None, return_iou_token_out=False,
                      disable_custom_iou_embed=False, skip_last_n_keys=0):
        """image_embeddings/dense_prompt_embeddings: [B or 1, h, w, C] NHWC;
        image_pe: [h, w, C]; sparse: [B, N, C]."""
        s = 0
        toks = [self.iou_token, self.mask_tokens]
        if self.pred_obj_scores:
            toks = [self.obj_score_token] + toks
            s = 1
        output_tokens = jnp.concatenate(toks, axis=0).astype(self.dtype)
        bs = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (bs,) + output_tokens.shape)
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

        if repeat_image or image_embeddings.shape[0] != bs:
            src = jnp.broadcast_to(
                image_embeddings, (bs,) + image_embeddings.shape[1:])
        else:
            src = image_embeddings
        src = src + dense_prompt_embeddings
        pos_src = jnp.broadcast_to(image_pe[None], src.shape)

        b, h, w, c = src.shape
        hs, src_out = self.transformer(src, pos_src, tokens,
                                       skip_last_n_keys=skip_last_n_keys)
        iou_token_out = hs[:, s, :]
        mask_tokens_out = hs[:, s + 1: s + 1 + self.num_mask_tokens, :]
        if return_iou_token_out:
            my_iou_token_out = (iou_token_out if disable_custom_iou_embed
                                else hs[:, -1, :])
        else:
            my_iou_token_out = None

        src_img = src_out.reshape(b, h, w, c)
        up = conv_transpose_2x2_s2(src_img, self.upscale_dc1_kernel,
                                   self.upscale_dc1_bias)
        if self.use_high_res_features:
            feat_s0, feat_s1 = high_res_features
            up = ACT["gelu"](self.upscale_ln(up + feat_s1))
            up = conv_transpose_2x2_s2(up, self.upscale_dc2_kernel,
                                       self.upscale_dc2_bias)
            up = ACT["gelu"](up + feat_s0)
        else:
            up = ACT["gelu"](self.upscale_ln(up))
            up = conv_transpose_2x2_s2(up, self.upscale_dc2_kernel,
                                       self.upscale_dc2_bias)
            up = ACT["gelu"](up)

        hyper_in = jnp.stack(
            [self.hyper_mlps[i](mask_tokens_out[:, i, :])
             for i in range(self.num_mask_tokens)], axis=1)  # [B, M, C/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, up)

        iou_pred = self.iou_prediction_head(iou_token_out)
        # reference keeps the MLP obj-score head dead (see module docstring)
        object_score_logits = 10.0 * jnp.ones((iou_pred.shape[0], 1),
                                              iou_pred.dtype)
        return masks, iou_pred, mask_tokens_out, object_score_logits, my_iou_token_out

    def _get_stability_scores(self, mask_logits):
        flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
        d = self.dynamic_multimask_stability_delta
        area_i = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / area_u, 1.0)

    def _dynamic_multimask_via_stability(self, all_mask_logits, all_iou_scores):
        multimask_logits = all_mask_logits[:, 1:]
        multimask_iou = all_iou_scores[:, 1:]
        best = jnp.argmax(multimask_iou, axis=-1)
        bi = jnp.arange(multimask_iou.shape[0])
        best_logits = multimask_logits[bi, best][:, None]
        best_scores = multimask_iou[bi, best][:, None]

        single_logits = all_mask_logits[:, 0:1]
        single_iou = all_iou_scores[:, 0:1]
        stable = (self._get_stability_scores(single_logits)
                  >= self.dynamic_multimask_stability_thresh)
        out_logits = jnp.where(stable[..., None, None], single_logits, best_logits)
        out_scores = jnp.where(stable, single_iou, best_scores)
        return out_logits, out_scores

    def predict_best_of_multimask(self, image_embeddings, image_pe,
                                  sparse_prompt_embeddings,
                                  dense_prompt_embeddings, repeat_image,
                                  high_res_features=None, skip_last_n_keys=0):
        """Fused grid-decode path: runs the transformer, predicts IoUs, picks
        the best multimask token (channels 1..3, the NTTT selection at
        Sam2MatchingBaseline_noAMG.py:295-299) and computes ONLY that mask —
        the per-prompt [B, 4, 4H, 4W] mask product is the decode's largest
        tensor, so computing 1/4 of it cuts the dominant HBM traffic.
        Numerics identical to output_all_masks + host-side best-of select."""
        s = 1 if self.pred_obj_scores else 0
        toks = [self.iou_token, self.mask_tokens]
        if self.pred_obj_scores:
            toks = [self.obj_score_token] + toks
        output_tokens = jnp.concatenate(toks, axis=0).astype(self.dtype)
        bs = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (bs,) + output_tokens.shape)
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings],
                                 axis=1)
        # Keep the image side at its own (possibly 1) batch: identical-across-
        # prompt projections (layer-0 q/k/v on 4096 tokens) are then computed
        # once and broadcast inside the attention einsums, instead of being
        # replicated per prompt. The keys diverge naturally after the first
        # image<-token update.
        src = image_embeddings + dense_prompt_embeddings
        pos_src = jnp.broadcast_to(image_pe[None], src.shape)
        h, w, c = src.shape[1:]
        hs, src_out = self.transformer(src, pos_src, tokens,
                                       skip_last_n_keys=skip_last_n_keys)
        b = bs
        iou_token_out = hs[:, s, :]
        mask_tokens_out = hs[:, s + 1: s + 1 + self.num_mask_tokens, :]
        iou_pred = self.iou_prediction_head(iou_token_out)

        best = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1   # channels 1..3
        bi = jnp.arange(bs)
        hyper_all = jnp.stack(
            [self.hyper_mlps[i](mask_tokens_out[:, i, :])
             for i in range(self.num_mask_tokens)], axis=1)
        hyper_best = hyper_all[bi, best]                   # [B, C/8]

        mask = self._upscale_product_unshuffled(src_out, hyper_best, h, w,
                                                high_res_features)
        return mask, iou_pred[bi, best]

    def _upscale_product_unshuffled(self, src_flat, hyper, h, w,
                                    high_res_features):
        """Output upscaling + hypernetwork product without ever leaving the
        deconv's natural (unshuffled) layout.

        The shuffled formulation (conv_transpose -> subpixel shuffle -> LN ->
        GELU -> conv_transpose -> product, the classic path above) makes XLA
        materialize the [B,2H,2W,C/4] intermediate through a strided relayout
        and lower deconv2+product as a tiny-channel convolution fusion (~8
        TFLOP/s measured). Here the whole chain runs in the flat GEMM layout
        — rows (y, x), cols (phase, channel), skip features pre-transposed
        once — as ONE Pallas pass on TPU (ops/upscale_product.fused_post_t1,
        first deconv GEMM in-kernel) or its XLA twin on CPU, and only the
        final [B,4h,4w] mask is re-ordered. Same dot products and per-pixel
        LN vectors as the shuffled path, fp32 stats/accumulation; only row
        order differs."""
        b = src_flat.shape[0]
        d = self.transformer_dim
        c1, c2 = d // 4, d // 8
        hw = h * w

        # First deconv: one lane-full GEMM [b*hw, d] @ [d, 4*c1] — cols
        # (dy1, dx1, c1). On TPU it runs INSIDE the fused kernel (k1mat
        # passed below) so the raw t1 never reaches HBM.
        k1 = self.upscale_dc1_kernel.transpose(0, 2, 3, 1).reshape(d, 4 * c1)
        bias1_4 = jnp.tile(self.upscale_dc1_bias, 4)

        if high_res_features is not None:
            feat_s0, feat_s1 = high_res_features
            # [1, 2h, 2w, c1] -> (y, dy1, x, dx1, c1) -> rows (y, x), cols
            # (dy1, dx1, c1)
            s1f = feat_s1.reshape(h, 2, w, 2, c1).transpose(0, 2, 1, 3, 4) \
                .reshape(hw, 4 * c1)
            # [1, 4h, 4w, c2] -> (y, dy1, dy2, x, dx1, dx2, c2) -> rows
            # (y, x), cols (dy1, dx1, dy2, dx2, c2)
            s0f16 = feat_s0.reshape(h, 2, 2, w, 2, 2, c2) \
                .transpose(0, 3, 1, 4, 2, 5, 6).reshape(hw, 16 * c2)
        else:
            s1f = jnp.zeros((hw, 4 * c1), src_flat.dtype)
            s0f16 = jnp.zeros((hw, 16 * c2), src_flat.dtype)

        k2 = self.upscale_dc2_kernel.transpose(0, 2, 3, 1).reshape(c1, 4 * c2)
        ln = self.upscale_ln.variables["params"]

        # The whole chain — first deconv GEMM, +bias+skip, LN over c1, GELU,
        # second deconv GEMM, +bias+skip, GELU, hypernetwork product — runs
        # in ONE Pallas pass (TPU): the XLA lowering materializes the
        # [b, hw*4, *] intermediates through a half-lane (c1=64) LN/GELU
        # fusion + t2 GEMM + product epilogue profiled at ~52 ms/step at
        # flagship shapes. Same contractions, fp32 stats/accumulation
        # (ops/upscale_product).
        from no_time_to_train_tpu.ops.upscale_product import (
            default_device_is_cpu, fusion_disabled, fused_post_t1,
            fused_post_t1_xla)
        src3 = src_flat.reshape(b, hw, d)
        if default_device_is_cpu() or fusion_disabled():
            t1 = jnp.einsum("bhd,dm->bhm", src3, k1.astype(src3.dtype),
                            preferred_element_type=src3.dtype)
            mask16 = fused_post_t1_xla(
                t1, bias1_4, s1f, ln["weight"], ln["bias"], k2,
                self.upscale_dc2_bias, s0f16, hyper, eps=self.upscale_ln.eps)
        else:
            # out_16pt: the kernel emits [b, (dy1, dx1, dy2, dx2), (y, x)] —
            # phases on sublanes, positions on full lanes (the [b, hw, 16]
            # layout masks 16/128 output lanes; measured 0.6 ms/chunk slower)
            m16 = fused_post_t1(
                src3, bias1_4, s1f, ln["weight"], ln["bias"], k2,
                self.upscale_dc2_bias, s0f16, hyper, k1mat=k1,
                out_16pt=True, eps=self.upscale_ln.eps)
            return (m16.reshape(b, 2, 2, 2, 2, h, w)
                    .transpose(0, 5, 1, 3, 6, 2, 4).reshape(b, 4 * h, 4 * w))
        # [b, (y, x), (dy1, dx1, dy2, dx2)] -> (b, y, dy1, dy2, x, dx1, dx2)
        mask = (mask16.reshape(b, h, w, 2, 2, 2, 2)
                .transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, 4 * h, 4 * w))
        return mask

    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output, repeat_image,
                 high_res_features=None, return_iou_token_out=False,
                 disable_custom_iou_embed=False, disable_mlp_obj_scores=False,
                 output_all_masks=False, skip_last_n_keys=0):
        masks, iou_pred, mask_tokens_out, object_score_logits, iou_token_out = (
            self.predict_masks(
                image_embeddings, image_pe, sparse_prompt_embeddings,
                dense_prompt_embeddings, repeat_image, high_res_features,
                return_iou_token_out, disable_custom_iou_embed,
                skip_last_n_keys))
        if output_all_masks:
            if return_iou_token_out:
                return masks, iou_pred, mask_tokens_out, object_score_logits, iou_token_out
            return masks, iou_pred, mask_tokens_out, object_score_logits

        if multimask_output:
            masks = masks[:, 1:]
            iou_pred = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability:
            masks, iou_pred = self._dynamic_multimask_via_stability(masks, iou_pred)
        else:
            masks = masks[:, 0:1]
            iou_pred = iou_pred[:, 0:1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]

        if return_iou_token_out:
            return masks, iou_pred, sam_tokens_out, object_score_logits, iou_token_out
        return masks, iou_pred, sam_tokens_out, object_score_logits
