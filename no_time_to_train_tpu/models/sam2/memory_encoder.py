"""Memory encoder (reference sam2/modeling/memory_encoder.py, flax NHWC):
mask downsampler conv pyramid + ConvNeXt fuser + 64-d output projection."""
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.common import LayerNorm2d, ACT
from no_time_to_train_tpu.models.sam2.pos_enc import sine_pos_embed_2d


class MaskDownSampler(nn.Module):
    embed_dim: int = 256
    kernel_size: int = 4
    stride: int = 4
    padding: int = 0
    total_stride: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        chans = 1
        idx = 0
        for _ in range(num_layers):
            out_chans = chans * (self.stride ** 2)
            x = nn.Conv(out_chans, (self.kernel_size, self.kernel_size),
                        strides=(self.stride, self.stride),
                        padding=((self.padding, self.padding),) * 2,
                        name=f"encoder_{idx}", dtype=self.dtype)(x)
            x = LayerNorm2d(name=f"encoder_{idx + 1}", dtype=self.dtype)(x)
            x = ACT["gelu"](x)
            chans = out_chans
            idx += 3
        return nn.Conv(self.embed_dim, (1, 1), name=f"encoder_{idx}",
                       dtype=self.dtype)(x)


class CXBlock(nn.Module):
    dim: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6
    use_dwconv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (self.kernel_size, self.kernel_size),
                    padding=((self.padding, self.padding),) * 2,
                    feature_group_count=self.dim if self.use_dwconv else 1,
                    name="dwconv", dtype=self.dtype)(x)
        x = LayerNorm2d(name="norm", dtype=self.dtype)(x)
        x = nn.Dense(4 * self.dim, name="pwconv1", dtype=self.dtype)(x)
        x = ACT["gelu"](x)
        x = nn.Dense(self.dim, name="pwconv2", dtype=self.dtype)(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param("gamma", nn.initializers.constant(
                self.layer_scale_init_value), (self.dim,))
            x = gamma.astype(x.dtype) * x
        return inp + x


class Fuser(nn.Module):
    dim: int
    num_layers: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6
    use_dwconv: bool = True
    input_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.input_projection:
            x = nn.Conv(self.dim, (1, 1), name="proj", dtype=self.dtype)(x)
        for i in range(self.num_layers):
            x = CXBlock(self.dim, self.kernel_size, self.padding,
                        self.layer_scale_init_value, self.use_dwconv,
                        name=f"layers_{i}", dtype=self.dtype)(x)
        return x


class MemoryEncoder(nn.Module):
    out_dim: int
    in_dim: int = 256
    mask_downsampler_kwargs: dict = None
    fuser_num_layers: int = 2
    pos_num_feats: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, masks, skip_mask_sigmoid: bool = False):
        """pix_feat: [B, H, W, C] NHWC; masks: [B, 16H, 16W, 1]."""
        if not skip_mask_sigmoid:
            masks = nn.sigmoid(masks)
        kw = self.mask_downsampler_kwargs or {}
        masks = MaskDownSampler(embed_dim=self.in_dim, name="mask_downsampler",
                                dtype=self.dtype, **kw)(masks)
        x = nn.Conv(self.in_dim, (1, 1), name="pix_feat_proj",
                    dtype=self.dtype)(pix_feat)
        x = x + masks
        x = Fuser(self.in_dim, self.fuser_num_layers, name="fuser",
                  dtype=self.dtype)(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), name="out_proj",
                        dtype=self.dtype)(x)
        pos = sine_pos_embed_2d(x.shape[1], x.shape[2], self.pos_num_feats,
                                dtype=x.dtype)
        pos = jnp.broadcast_to(pos[None], x.shape[:1] + pos.shape)
        return {"vision_features": x, "vision_pos_enc": [pos]}
