"""DINOv2 ViT feature extractor in flax (NHWC input).

Numerics match HF `transformers.Dinov2Model` (the reference loads encoders via
AutoModel — no_time_to_train/models/model_utils.py:35-72) for the preset input
resolution (518 for DINOv2: the checkpoint position grid, so no pos-embed
interpolation on the hot path; `interp_pos_to` supports other sizes with
torch-parity bicubic+antialias).

DINOv3 (RoPE ViT with register tokens) lives in models/dino_v3.py; the
presets for both families are registered in config/presets.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.config.presets import EncoderConfig
from no_time_to_train_tpu.models.sam2.common import LayerNorm, _gelu_act
from no_time_to_train_tpu.ops.attention import sdpa_bnhd
from no_time_to_train_tpu.ops.quant import dense_cls
from no_time_to_train_tpu.ops.resize import resize


class DinoAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        D = dense_cls(self.quant)
        q = D(c, name="query", dtype=self.dtype)(x)
        k = D(c, name="key", dtype=self.dtype)(x)
        v = D(c, name="value", dtype=self.dtype)(x)

        # stay in the [b, n, h, d] qkv-GEMM layout end-to-end (sdpa_bnhd):
        # a [b, h, n, d] relayout is a real copy under the Pallas impl and
        # an einsum-folded no-op under XLA, so bnhd is never worse
        def split(t):
            return t.reshape(b, n, self.num_heads, -1)

        out = sdpa_bnhd(split(q), split(k), split(v))
        out = out.reshape(b, n, c)
        return dense_cls(self.quant)(c, name="output", dtype=self.dtype)(out)


class DinoMLP(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        D = dense_cls(self.quant)
        x = D(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = _gelu_act(x)
        return D(c, name="fc2", dtype=self.dtype)(x)


class DinoSwiGLU(nn.Module):
    """HF Dinov2SwiGLUFFN (giant): hidden = 4*c, 2/3, round to multiple of 8."""
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = (int(c * 4 * 2 / 3) + 7) // 8 * 8
        D = dense_cls(self.quant)
        wi = D(2 * hidden, name="weights_in", dtype=self.dtype)(x)
        x1, x2 = wi[..., :hidden], wi[..., hidden:]
        h = nn.silu(x1) * x2
        return D(c, name="weights_out", dtype=self.dtype)(h)


class DinoLayer(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    use_layer_scale: bool = True
    ffn_layer: str = "mlp"
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = LayerNorm(eps=1e-6, name="norm1", dtype=self.dtype)(x)
        h = DinoAttention(self.num_heads, name="attention", dtype=self.dtype,
                          quant=self.quant)(h)
        if self.use_layer_scale:
            ls1 = self.param("layer_scale1", nn.initializers.ones, (c,))
            h = h * ls1.astype(h.dtype)
        x = x + h
        h = LayerNorm(eps=1e-6, name="norm2", dtype=self.dtype)(x)
        if self.ffn_layer == "swiglu":
            h = DinoSwiGLU(name="mlp", dtype=self.dtype,
                           quant=self.quant)(h)
        else:
            h = DinoMLP(self.mlp_ratio * c, name="mlp", dtype=self.dtype,
                        quant=self.quant)(h)
        if self.use_layer_scale:
            ls2 = self.param("layer_scale2", nn.initializers.ones, (c,))
            h = h * ls2.astype(h.dtype)
        return x + h


class DinoV2(nn.Module):
    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"   # "int8": W8A8 encoder GEMMs (ops/quant.py)

    @nn.compact
    def __call__(self, imgs, drop_prefix_tokens: bool = True):
        """imgs: [B, S, S, 3] normalized, S = cfg.img_size. Returns patch
        features [B, grid*grid, D] (prefix CLS dropped when requested — the
        NTTT `_forward_encoder` semantics, Sam2MatchingBaseline_noAMG.py:239-256)."""
        c = self.cfg
        b, s, _, _ = imgs.shape
        grid = s // c.patch_size
        x = nn.Conv(c.feat_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embeddings", dtype=self.dtype)(imgs)
        x = x.reshape(b, grid * grid, c.feat_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, c.feat_dim))
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1 + c.grid_size * c.grid_size, c.feat_dim))
        if grid != c.grid_size:
            # torch-parity bicubic antialias pos interpolation (HF Dinov2)
            patch_pos = pos[1:].reshape(c.grid_size, c.grid_size, c.feat_dim)
            patch_pos = resize(patch_pos[None].astype(jnp.float32),
                               (grid, grid), mode="bicubic", antialias=True)[0]
            pos_use = jnp.concatenate(
                [pos[:1], patch_pos.reshape(grid * grid, c.feat_dim)], axis=0)
        else:
            pos_use = pos

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token[None], (b, 1, c.feat_dim)), x], axis=1)
        x = x + pos_use[None].astype(x.dtype)

        for i in range(c.depth):
            x = DinoLayer(c.num_heads,
                          use_layer_scale=(c.init_values is not None),
                          ffn_layer=c.ffn_layer, name=f"layer_{i}",
                          dtype=self.dtype, quant=self.quant)(x)
        x = LayerNorm(eps=1e-6, name="layernorm", dtype=self.dtype)(x)
        if drop_prefix_tokens:
            x = x[:, 1 + c.num_register_tokens:, :]
        return x


def convert_hf_dinov2(sd, cfg: EncoderConfig):
    """HF Dinov2Model state dict (numpy) -> DinoV2 flax params."""
    out = {
        "cls_token": sd["embeddings.cls_token"][0],
        "position_embeddings": sd["embeddings.position_embeddings"][0],
        "patch_embeddings": {
            "kernel": sd["embeddings.patch_embeddings.projection.weight"]
            .transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "layernorm": {"weight": sd["layernorm.weight"],
                      "bias": sd["layernorm.bias"]},
    }
    for i in range(cfg.depth):
        p = f"encoder.layer.{i}"
        layer = {
            "norm1": {"weight": sd[f"{p}.norm1.weight"],
                      "bias": sd[f"{p}.norm1.bias"]},
            "norm2": {"weight": sd[f"{p}.norm2.weight"],
                      "bias": sd[f"{p}.norm2.bias"]},
            "attention": {
                "query": {"kernel": sd[f"{p}.attention.attention.query.weight"].T,
                          "bias": sd[f"{p}.attention.attention.query.bias"]},
                "key": {"kernel": sd[f"{p}.attention.attention.key.weight"].T,
                        "bias": sd[f"{p}.attention.attention.key.bias"]},
                "value": {"kernel": sd[f"{p}.attention.attention.value.weight"].T,
                          "bias": sd[f"{p}.attention.attention.value.bias"]},
                "output": {"kernel": sd[f"{p}.attention.output.dense.weight"].T,
                           "bias": sd[f"{p}.attention.output.dense.bias"]},
            },
        }
        if cfg.init_values is not None:
            layer["layer_scale1"] = sd[f"{p}.layer_scale1.lambda1"]
            layer["layer_scale2"] = sd[f"{p}.layer_scale2.lambda1"]
        if cfg.ffn_layer == "swiglu":
            layer["mlp"] = {
                "weights_in": {"kernel": sd[f"{p}.mlp.weights_in.weight"].T,
                               "bias": sd[f"{p}.mlp.weights_in.bias"]},
                "weights_out": {"kernel": sd[f"{p}.mlp.weights_out.weight"].T,
                                "bias": sd[f"{p}.mlp.weights_out.bias"]},
            }
        else:
            layer["mlp"] = {
                "fc1": {"kernel": sd[f"{p}.mlp.fc1.weight"].T,
                        "bias": sd[f"{p}.mlp.fc1.bias"]},
                "fc2": {"kernel": sd[f"{p}.mlp.fc2.weight"].T,
                        "bias": sd[f"{p}.mlp.fc2.bias"]},
            }
        out[f"layer_{i}"] = layer
    return out
