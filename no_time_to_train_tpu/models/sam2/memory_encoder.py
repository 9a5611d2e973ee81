"""Memory encoder (reference sam2/modeling/memory_encoder.py, flax NHWC):
mask downsampler conv pyramid + ConvNeXt fuser + 64-d output projection."""
import jax
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.common import LayerNorm2d, ACT
from no_time_to_train_tpu.models.sam2.pos_enc import sine_pos_embed_2d


class _ConvP(nn.Module):
    """Parameter holder with nn.Conv's exact {kernel, bias} tree (HWIO), so
    torch checkpoints convert unchanged while the conv math runs in the
    parent. Calling it returns (kernel, bias)."""
    shape: tuple  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return kernel, bias


class _LNP(nn.Module):
    """Parameter holder with LayerNorm2d's exact {weight, bias} tree; the
    channel-first normalize math runs in the parent."""
    features: int

    @nn.compact
    def __call__(self):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return weight, bias


def _conv3x3s2_cl(x, kernel, bias, dtype):
    """3x3 stride-2 pad-1 conv on a channel-LEADING [B, C, H, W] tensor as
    nine shifted parity planes contracted in one GEMM. Output pixel (i, j)
    reads input (2i+di-1, 2j+dj-1) for di, dj in 0..2; splitting the input
    into its four (row, col)-parity planes via ONE space-to-depth (the same
    reshape+transpose pattern as the Hiera patch embed, measured
    memory-bound), every tap becomes a parity plane shifted by at most one
    BLOCK — a plain zero pad + unit slice. Direct stride-2 lane slices are
    NOT used: XLA lowers them to element gathers (measured 2.7 ms per
    512^2-plane tap, ~0.4 GB/s)."""
    b, c, h, w = x.shape
    s = x.reshape(b, c, h // 2, 2, w // 2, 2)
    s = s.transpose(0, 3, 5, 1, 2, 4)  # [B, row-parity, col-parity, C, ...]
    ee, eo = s[:, 0, 0], s[:, 0, 1]
    oe, oo = s[:, 1, 0], s[:, 1, 1]

    def down(a):  # block row i-1 (input row 2i-1): pad top, drop bottom
        return jnp.pad(a, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1, :]

    def right(a):  # block col j-1 (input col 2j-1): pad left, drop right
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (1, 0)))[:, :, :, :-1]

    taps = [right(down(oo)), down(oe), down(oo),
            right(eo),       ee,       eo,
            right(oo),       oe,       oo]  # (di, dj) row-major
    taps = jnp.concatenate(taps, axis=1)  # [B, 9C, H/2, W/2]
    wk = jnp.asarray(kernel, dtype).reshape(9 * c, -1)  # (di, dj, c) major
    y = jnp.einsum('bkhw,ko->bohw', taps, wk)
    return y + jnp.asarray(bias, dtype)[None, :, None, None]


def _layer_norm_cf(x, weight, bias, eps, dtype):
    """Channel-first LayerNorm2d on [B, C, H, W]; same stats dtype and cast
    points as common._layer_norm (f32 stats, compute-dtype normalize)."""
    xf = x.astype(jnp.float32)
    u = xf.mean(axis=1, keepdims=True)
    s = jnp.square(xf - u).mean(axis=1, keepdims=True)
    inv = jax.lax.rsqrt(s + eps)
    wb = weight[None, :, None, None]
    bb = bias[None, :, None, None]
    if dtype == jnp.float32:
        return (xf - u) * inv * wb + bb
    y = (x - u.astype(dtype)) * inv.astype(dtype)
    return y * wb.astype(dtype) + bb.astype(dtype)


class MaskDownSampler(nn.Module):
    """Reference sam2/modeling/memory_encoder.py:19-52 (MaskDownSampler).

    TPU-first layout: with C = 1..64 an NHWC conv wastes the 128-lane
    registers (profiled 2.5 ms for the 19-MFLOP first conv at 1024^2 —
    ~10% of a video frame), so for the shipping k=3/s=2/p=1 config the
    low-channel pyramid runs channel-LEADING ([B, C, H, W], spatial W in
    lanes) as shifted-plane GEMMs, transposing to NHWC only for the final
    1x1 projection where C reaches embed_dim. Other configs (and odd
    spatial dims) fall back to nn.Conv with the identical param tree."""
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
        gemm_cfg = (self.kernel_size == 3 and self.stride == 2
                    and self.padding == 1)
        chans = 1
        idx = 0
        cl = None  # channel-leading [B, C, H, W] view, when active
        for _ in range(num_layers):
            out_chans = chans * (self.stride ** 2)
            h, w = (cl.shape[2:] if cl is not None else x.shape[1:3])
            if gemm_cfg and h % 2 == 0 and w % 2 == 0:
                if cl is None:
                    cl = jnp.transpose(x.astype(self.dtype), (0, 3, 1, 2))
                ck, cb = _ConvP((3, 3, chans, out_chans),
                                name=f"encoder_{idx}")()
                lw, lb = _LNP(out_chans, name=f"encoder_{idx + 1}")()
                cl = _conv3x3s2_cl(cl, ck, cb, self.dtype)
                cl = _layer_norm_cf(cl, lw, lb, 1e-6, self.dtype)
                cl = ACT["gelu"](cl)
            else:
                if cl is not None:
                    x = jnp.transpose(cl, (0, 2, 3, 1))
                    cl = None
                x = nn.Conv(out_chans, (self.kernel_size, self.kernel_size),
                            strides=(self.stride, self.stride),
                            padding=((self.padding, self.padding),) * 2,
                            name=f"encoder_{idx}", dtype=self.dtype)(x)
                x = LayerNorm2d(name=f"encoder_{idx + 1}", dtype=self.dtype)(x)
                x = ACT["gelu"](x)
            chans = out_chans
            idx += 3
        if cl is not None:
            x = jnp.transpose(cl, (0, 2, 3, 1))
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
