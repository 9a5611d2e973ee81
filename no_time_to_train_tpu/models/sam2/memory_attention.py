"""Memory attention (reference sam2/modeling/memory_attention.py, flax).

Batch-first layout throughout: curr [B, N, C], memory [B, M, mem_dim].
Dropout is inference-off (the whole NTTT path is training-free)."""
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.common import LayerNorm, ACT
from no_time_to_train_tpu.models.sam2.transformer import RoPEAttention


class MemoryAttentionLayer(nn.Module):
    d_model: int = 256
    dim_feedforward: int = 2048
    activation: str = "relu"
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False
    self_num_heads: int = 1
    cross_num_heads: int = 1
    cross_kv_in_dim: int = 64
    rope_theta: float = 10000.0
    rope_feat_sizes: tuple = (32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 num_k_exclude_rope: int = 0, memory_valid=None):
        # Self-attention (RoPE)
        tgt2 = LayerNorm(name="norm1", dtype=self.dtype)(tgt)
        q = tgt2 + query_pos if self.pos_enc_at_attn else tgt2
        tgt2 = RoPEAttention(self.d_model, self.self_num_heads,
                             rope_theta=self.rope_theta,
                             feat_sizes=self.rope_feat_sizes,
                             name="self_attn", dtype=self.dtype)(q, q, tgt2)
        tgt = tgt + tgt2

        # Cross-attention to memory (RoPE with k-repeat, 64-d kv)
        tgt2 = LayerNorm(name="norm2", dtype=self.dtype)(tgt)
        qq = tgt2 + query_pos if self.pos_enc_at_cross_attn_queries else tgt2
        kk = memory + pos if self.pos_enc_at_cross_attn_keys else memory
        tgt2 = RoPEAttention(self.d_model, self.cross_num_heads,
                             kv_in_dim=self.cross_kv_in_dim,
                             rope_theta=self.rope_theta,
                             rope_k_repeat=True,
                             feat_sizes=self.rope_feat_sizes,
                             name="cross_attn_image", dtype=self.dtype)(
            qq, kk, memory, num_k_exclude_rope=num_k_exclude_rope,
            key_valid=memory_valid)
        tgt = tgt + tgt2

        # FFN
        tgt2 = LayerNorm(name="norm3", dtype=self.dtype)(tgt)
        tgt2 = nn.Dense(self.dim_feedforward, name="linear1",
                        dtype=self.dtype)(tgt2)
        tgt2 = ACT[self.activation](tgt2)
        tgt2 = nn.Dense(self.d_model, name="linear2", dtype=self.dtype)(tgt2)
        return tgt + tgt2


class MemoryAttention(nn.Module):
    d_model: int = 256
    num_layers: int = 4
    pos_enc_at_input: bool = True
    layer_kwargs: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, curr, curr_pos, memory, memory_pos,
                 num_obj_ptr_tokens: int = 0, memory_valid=None):
        output = curr
        if self.pos_enc_at_input and curr_pos is not None:
            output = output + 0.1 * curr_pos
        kw = self.layer_kwargs or {}
        for i in range(self.num_layers):
            output = MemoryAttentionLayer(
                d_model=self.d_model, name=f"layers_{i}", dtype=self.dtype,
                **kw)(output, memory, pos=memory_pos, query_pos=curr_pos,
                      num_k_exclude_rope=num_obj_ptr_tokens,
                      memory_valid=memory_valid)
        return LayerNorm(name="norm", dtype=self.dtype)(output)
