"""Two-way transformer + attention layers (reference
sam2/modeling/sam/transformer.py, flax rewrite) including the NTTT-specific
`skip_last_n_keys` masking (:268-277) that hides the custom IoU token from
image->token cross-attention, and RoPE attention with `num_k_exclude_rope`
(:345-351) for object-pointer tokens."""
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.common import MLP, LayerNorm, LayerNormP
from no_time_to_train_tpu.models.sam2.pos_enc import axial_rope_cos_sin, apply_rotary
from no_time_to_train_tpu.ops.attention import sdpa


def _skip_mask(n_q, n_k, skip_last_n_keys, is_cross_skip, dtype=bool):
    if skip_last_n_keys <= 0:
        return None
    m = jnp.ones((n_q, n_k), dtype=bool)
    if is_cross_skip:
        m = m.at[:, n_k - skip_last_n_keys:].set(False)
    else:
        m = m.at[: n_q - skip_last_n_keys, n_k - skip_last_n_keys:].set(False)
    return m


class Attention(nn.Module):
    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def internal_dim(self):
        return self.embedding_dim // self.downsample_rate

    def setup(self):
        self.q_proj = nn.Dense(self.internal_dim, name="q_proj",
                               dtype=self.dtype)
        self.k_proj = nn.Dense(self.internal_dim, name="k_proj",
                               dtype=self.dtype)
        self.v_proj = nn.Dense(self.internal_dim, name="v_proj",
                               dtype=self.dtype)
        self.out_proj = nn.Dense(self.embedding_dim, name="out_proj",
                                 dtype=self.dtype)

    def __call__(self, q, k, v, skip_last_n_keys: int = 0,
                 is_cross_skip: bool = False):
        q = self.q_proj(q)
        k = self.k_proj(k)
        v = self.v_proj(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads, c // self.num_heads
                             ).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        mask = _skip_mask(qh.shape[-2], kh.shape[-2], skip_last_n_keys,
                          is_cross_skip)
        out = sdpa(qh, kh, vh, mask=mask)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.out_proj(out)

    def i2t_fused_with_norm(self, keys, key_pe, tok_q_in, tok_v_in, norm):
        """Image<-token cross-attention + residual + LayerNorm via the fused
        Pallas pass (ops/decoder_attention.py): equivalent to
        `norm(keys + self(keys + key_pe, tok_q_in, tok_v_in))` with keys read
        from HBM once. Token-side projections and the (shared) pe projection
        stay in XLA (tiny)."""
        from no_time_to_train_tpu.ops.decoder_attention import fused_i2t_norm
        tok_k = self.k_proj(tok_q_in)
        tok_v = self.v_proj(tok_v_in)
        pq = self.q_proj.variables["params"]
        po = self.out_proj.variables["params"]
        pe_q = key_pe @ pq["kernel"].astype(key_pe.dtype)
        return fused_i2t_norm(
            keys, pe_q, tok_k, tok_v, pq["kernel"], pq["bias"],
            po["kernel"], po["bias"], norm.weight, norm.bias,
            num_heads=self.num_heads, eps=norm.eps)

    def t2i_fused(self, keys, key_pe, tok_q_in):
        """Token->image cross-attention with the k/v projections computed
        inside the streamed Pallas pass (ops/decoder_attention.py):
        equivalent to `self(tok_q_in, keys + key_pe, keys)` with keys read
        from HBM once instead of twice-projected and logits-materialized."""
        from no_time_to_train_tpu.ops.decoder_attention import fused_t2i_attn
        tq = self.q_proj(tok_q_in)
        pk_ = self.k_proj.variables["params"]
        pv_ = self.v_proj.variables["params"]
        pe_k = key_pe @ pk_["kernel"].astype(key_pe.dtype)
        o = fused_t2i_attn(keys, pe_k, tq, pk_["kernel"], pk_["bias"],
                           pv_["kernel"], pv_["bias"],
                           num_heads=self.num_heads)
        return self.out_proj(o)

    def i2t_fusible(self, keys, tok_q_in, skip_last_n_keys):
        """True when the fused image-side passes apply: no key masking, a
        TPU-resident run (not CPU / not init), <=16 prompt tokens, and the
        decoder's lane-full head geometry (H*16 == internal, 128-multiples)."""
        from no_time_to_train_tpu.ops.upscale_product import (
            default_device_is_cpu, fusion_disabled)
        i = self.internal_dim
        return (skip_last_n_keys == 0 and not self.is_initializing()
                and not default_device_is_cpu() and not fusion_disabled()
                and tok_q_in.shape[1] <= 16
                and self.num_heads * 16 == i and i % 128 == 0
                and keys.shape[-1] % 128 == 0 and keys.shape[-2] % 8 == 0)


class RoPEAttention(nn.Module):
    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    feat_sizes: Tuple[int, int] = (32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0, key_valid=None):
        """key_valid: optional [B, Nk] bool — masks padded memory slots so a
        fixed-shape memory bank attends identically to the reference's
        dynamic-length concatenation (sam2_base.py:695-716)."""
        internal = self.embedding_dim // self.downsample_rate
        q = nn.Dense(internal, name="q_proj", dtype=self.dtype)(q)
        k = nn.Dense(internal, name="k_proj", dtype=self.dtype)(k)
        v = nn.Dense(internal, name="v_proj", dtype=self.dtype)(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads, c // self.num_heads
                             ).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)

        head_dim = internal // self.num_heads
        n_q = qh.shape[-2]
        side = int(math.sqrt(n_q))
        assert side * side == n_q, "RoPE attention expects square token grids"
        cos, sin = axial_rope_cos_sin(head_dim, side, side, self.rope_theta,
                                      dtype=jnp.float32)

        num_k_rope = kh.shape[-2] - num_k_exclude_rope
        if qh.shape[-2] != num_k_rope:
            assert self.rope_k_repeat
            repeat = num_k_rope // n_q
        else:
            repeat = 1
        qh = apply_rotary(qh, cos, sin)
        k_rot = apply_rotary(kh[:, :, :num_k_rope], cos, sin, repeat_freqs=repeat)
        kh = jnp.concatenate([k_rot, kh[:, :, num_k_rope:]], axis=2) \
            if num_k_exclude_rope > 0 else k_rot

        mask = None
        if key_valid is not None:
            mask = key_valid[:, None, None, :]
        out = sdpa(qh, kh, vh, mask=mask)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embedding_dim, name="out_proj", dtype=self.dtype)(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    activation: str = "relu"
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = Attention(self.embedding_dim, self.num_heads,
                                   name="self_attn", dtype=self.dtype)
        self.norm1 = LayerNorm(name="norm1", dtype=self.dtype)
        self.cross_attn_token_to_image = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            name="cross_attn_token_to_image", dtype=self.dtype)
        self.norm2 = LayerNorm(name="norm2", dtype=self.dtype)
        self.mlp = MLP(self.mlp_dim, self.embedding_dim, 2,
                       activation=self.activation, name="mlp",
                       dtype=self.dtype)
        self.norm3 = LayerNorm(name="norm3", dtype=self.dtype)
        self.cross_attn_image_to_token = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            name="cross_attn_image_to_token", dtype=self.dtype)
        self.norm4 = LayerNormP(self.embedding_dim, name="norm4",
                                dtype=self.dtype)

    def __call__(self, queries, keys, query_pe, key_pe, skip_last_n_keys=0):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries,
                                     skip_last_n_keys=skip_last_n_keys)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(
                q, q, queries, skip_last_n_keys=skip_last_n_keys)
        queries = self.norm1(queries)

        q = queries + query_pe
        t2i = self.cross_attn_token_to_image
        # token->image never carries the skip mask (reference transformer.py
        # passes it only to self-attn and image->token), so fusibility does
        # not depend on skip_last_n_keys here
        if t2i.i2t_fusible(keys, q, 0):
            attn_out = t2i.t2i_fused(keys, key_pe, q)
        else:
            k = keys + key_pe
            attn_out = t2i(q, k, keys)
        queries = self.norm2(queries + attn_out)

        queries = queries + self.mlp(queries)
        queries = self.norm3(queries)

        q = queries + query_pe
        i2t = self.cross_attn_image_to_token
        if i2t.i2t_fusible(keys, q, skip_last_n_keys):
            # image<-token + residual + norm4 as ONE Pallas pass over the
            # per-prompt image keys (the grid decode's dominant HBM traffic)
            keys = i2t.i2t_fused_with_norm(keys, key_pe, q, queries,
                                           self.norm4)
        else:
            k = keys + key_pe
            attn_out = i2t(k, q, queries,
                           skip_last_n_keys=skip_last_n_keys,
                           is_cross_skip=True)
            keys = self.norm4(keys + attn_out)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    activation: str = "relu"
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding,
                 skip_last_n_keys: int = 0):
        """image_embedding/image_pe: [B, H, W, C] (NHWC); point_embedding
        [B, N, C]. Returns (queries [B, N, C], keys [B, HW, C])."""
        bi, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(bi, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c) \
            if image_pe.ndim == 4 else image_pe

        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                activation=self.activation,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0), name=f"layers_{i}",
                dtype=self.dtype)(
                queries, keys, point_embedding, key_pe,
                skip_last_n_keys=skip_last_n_keys)

        q = queries + point_embedding
        fa = Attention(self.embedding_dim, self.num_heads,
                       downsample_rate=self.attention_downsample_rate,
                       name="final_attn_token_to_image", dtype=self.dtype)
        if fa.i2t_fusible(keys, q, skip_last_n_keys):
            attn_out = fa.t2i_fused(keys, key_pe, q)
        else:
            k = keys + key_pe
            attn_out = fa(q, k, keys, skip_last_n_keys=skip_last_n_keys)
        queries = LayerNorm(name="norm_final_attn", dtype=self.dtype)(
            queries + attn_out)
        return queries, keys
