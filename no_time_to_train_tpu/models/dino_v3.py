"""DINOv3 ViT feature extractor in flax (NHWC input).

Numerics match HF `transformers.DINOv3ViTModel` (the reference loads
dinov3 encoders via AutoModel — Sam2MatchingBaseline_noAMG.py:78-125):
CLS + register tokens + patches with NO learned position embedding; 2D RoPE
over patch-center coordinates in [-1,1] (half-split rotate convention, prefix
tokens un-rotated); LayerScale on both branches; plain or gated MLP.
"""
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.config.presets import EncoderConfig
from no_time_to_train_tpu.models.sam2.common import LayerNorm, _gelu_act
from no_time_to_train_tpu.ops.attention import sdpa_bnhd
from no_time_to_train_tpu.ops.quant import dense_cls


@lru_cache(maxsize=None)
def _rope_tables_np(num_h, num_w, head_dim, theta):
    coords_h = (np.arange(0.5, num_h) / num_h)
    coords_w = (np.arange(0.5, num_w) / num_w)
    hh, ww = np.meshgrid(coords_h, coords_w, indexing="ij")
    coords = np.stack([hh.reshape(-1), ww.reshape(-1)], axis=-1)  # [N, 2]
    coords = 2.0 * coords - 1.0
    inv_freq = 1.0 / theta ** np.arange(0, 1, 4 / head_dim)  # [head_dim/4]
    angles = 2 * np.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(len(coords), -1)
    angles = np.tile(angles, 2)  # [N, head_dim]
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class DinoV3Attention(nn.Module):
    num_heads: int
    n_prefix: int
    rope_theta: float = 100.0
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, grid_hw):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        D = dense_cls(self.quant)
        q = D(c, name="q_proj", dtype=self.dtype)(x)
        k = D(c, name="k_proj", dtype=self.dtype)(x)
        v = D(c, name="v_proj", dtype=self.dtype)(x)

        # stay in the [b, n, h, d] qkv-GEMM layout end-to-end (sdpa_bnhd):
        # a [b, h, n, d] relayout is a real copy under the Pallas impl and
        # an einsum-folded no-op under XLA, so bnhd is never worse
        def split(t):
            return t.reshape(b, n, self.num_heads, head_dim)

        qh, kh, vh = split(q), split(k), split(v)
        cos_np, sin_np = _rope_tables_np(grid_hw[0], grid_hw[1], head_dim,
                                         self.rope_theta)
        cos = jnp.asarray(cos_np, qh.dtype)[None, :, None, :]
        sin = jnp.asarray(sin_np, qh.dtype)[None, :, None, :]

        def rope(t):
            prefix, patches = t[:, :self.n_prefix], t[:, self.n_prefix:]
            patches = patches * cos + _rotate_half(patches) * sin
            return jnp.concatenate([prefix, patches], axis=1)

        out = sdpa_bnhd(rope(qh), rope(kh), vh)
        out = out.reshape(b, n, c)
        return dense_cls(self.quant)(c, name="o_proj", dtype=self.dtype)(out)


class DinoV3Layer(nn.Module):
    num_heads: int
    n_prefix: int
    mlp_ratio: int = 4
    use_gated_mlp: bool = False
    rope_theta: float = 100.0
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, grid_hw):
        c = x.shape[-1]
        h = LayerNorm(eps=1e-5, name="norm1", dtype=self.dtype)(x)
        h = DinoV3Attention(self.num_heads, self.n_prefix, self.rope_theta,
                            name="attention", dtype=self.dtype,
                            quant=self.quant)(h, grid_hw)
        ls1 = self.param("layer_scale1", nn.initializers.ones, (c,))
        x = x + h * ls1.astype(h.dtype)
        h = LayerNorm(eps=1e-5, name="norm2", dtype=self.dtype)(x)
        inter = self.mlp_ratio * c
        if self.use_gated_mlp:
            D = dense_cls(self.quant)
            gate = D(inter, name="mlp_gate", dtype=self.dtype)(h)
            up = D(inter, name="mlp_up", dtype=self.dtype)(h)
            h = D(c, name="mlp_down", dtype=self.dtype)(
                _gelu_act(gate) * up)
        else:
            D = dense_cls(self.quant)
            h = D(inter, name="mlp_up", dtype=self.dtype)(h)
            h = D(c, name="mlp_down", dtype=self.dtype)(
                _gelu_act(h))
        ls2 = self.param("layer_scale2", nn.initializers.ones, (c,))
        return x + h * ls2.astype(h.dtype)


class DinoV3(nn.Module):
    cfg: EncoderConfig
    use_gated_mlp: bool = False
    rope_theta: float = 100.0
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"   # "int8": W8A8 encoder GEMMs (ops/quant.py)

    @nn.compact
    def __call__(self, imgs, drop_prefix_tokens: bool = True):
        """imgs: [B, S, S, 3] normalized. Returns [B, grid*grid, D] patch
        features (CLS + registers dropped when requested, matching the NTTT
        `n_skip_tokens` semantics)."""
        c = self.cfg
        b, s, _, _ = imgs.shape
        grid = s // c.patch_size
        n_prefix = 1 + c.num_register_tokens

        x = nn.Conv(c.feat_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embeddings", dtype=self.dtype)(imgs)
        x = x.reshape(b, grid * grid, c.feat_dim)
        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, c.feat_dim))
        reg = self.param("register_tokens", nn.initializers.normal(1.0),
                         (c.num_register_tokens, c.feat_dim))
        prefix = jnp.concatenate([cls_token, reg], axis=0)
        x = jnp.concatenate(
            [jnp.broadcast_to(prefix[None], (b,) + prefix.shape).astype(x.dtype),
             x], axis=1)

        for i in range(c.depth):
            x = DinoV3Layer(c.num_heads, n_prefix,
                            use_gated_mlp=self.use_gated_mlp,
                            rope_theta=self.rope_theta,
                            name=f"layer_{i}", dtype=self.dtype,
                            quant=self.quant)(x, (grid, grid))
        x = LayerNorm(eps=1e-5, name="norm", dtype=self.dtype)(x)
        if drop_prefix_tokens:
            x = x[:, n_prefix:, :]
        return x


def convert_hf_dinov3(sd, cfg: EncoderConfig, use_gated_mlp=False):
    """HF DINOv3ViTModel state dict (numpy) -> DinoV3 flax params."""
    out = {
        "cls_token": sd["embeddings.cls_token"][0],
        "register_tokens": sd["embeddings.register_tokens"][0],
        "patch_embeddings": {
            "kernel": sd["embeddings.patch_embeddings.weight"]
            .transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.bias"],
        },
        "norm": {"weight": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(cfg.depth):
        p = f"layer.{i}"
        layer = {
            "norm1": {"weight": sd[f"{p}.norm1.weight"],
                      "bias": sd[f"{p}.norm1.bias"]},
            "norm2": {"weight": sd[f"{p}.norm2.weight"],
                      "bias": sd[f"{p}.norm2.bias"]},
            "layer_scale1": sd[f"{p}.layer_scale1.lambda1"],
            "layer_scale2": sd[f"{p}.layer_scale2.lambda1"],
            "attention": {},
        }
        for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("o_proj", "o_proj")):
            w = sd[f"{p}.attention.{theirs}.weight"].T
            entry = {"kernel": w}
            bkey = f"{p}.attention.{theirs}.bias"
            if bkey in sd:
                entry["bias"] = sd[bkey]
            else:
                entry["bias"] = np.zeros(w.shape[1], w.dtype)
            layer["attention"][ours] = entry
        if use_gated_mlp:
            layer["mlp_gate"] = {"kernel": sd[f"{p}.mlp.gate_proj.weight"].T,
                                 "bias": sd[f"{p}.mlp.gate_proj.bias"]}
            layer["mlp_up"] = {"kernel": sd[f"{p}.mlp.up_proj.weight"].T,
                               "bias": sd[f"{p}.mlp.up_proj.bias"]}
            layer["mlp_down"] = {"kernel": sd[f"{p}.mlp.down_proj.weight"].T,
                                 "bias": sd[f"{p}.mlp.down_proj.bias"]}
        else:
            layer["mlp_up"] = {"kernel": sd[f"{p}.mlp.up_proj.weight"].T,
                               "bias": sd[f"{p}.mlp.up_proj.bias"]}
            layer["mlp_down"] = {"kernel": sd[f"{p}.mlp.down_proj.weight"].T,
                                 "bias": sd[f"{p}.mlp.down_proj.bias"]}
        out[f"layer_{i}"] = layer
    return out
