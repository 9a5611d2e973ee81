"""Hiera image trunk (flax, NHWC) — TPU-native rewrite of the reference
sam2/modeling/backbones/hieradet.py.

Design notes (TPU-first):
  - NHWC throughout; window partition is a pure reshape/transpose (static
    shapes at the fixed 1024 input, so XLA lays windows out for free).
  - Windowed attention runs as batched SDPA over [B*nWin, ws*ws] tokens; the
    three global-attention blocks run full SDPA over 4096 tokens (the Pallas
    flash-attention hot spot, ops/attention.py).
  - Q-pooling (stage transitions) is a 2x2 max pool fused into the attention
    block, as in the reference (hieradet.py:62-65).
"""
from typing import Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.common import MLP, LayerNorm
from no_time_to_train_tpu.ops.attention import sdpa, sdpa_bnhd
from no_time_to_train_tpu.ops.resize import resize


def window_partition(x, ws):
    """[B, H, W, C] -> ([B*nw, ws, ws, C], (Hp, Wp)) with zero padding."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(windows, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // ws // ws)
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


def _max_pool_2x2(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4))


class PatchEmbed7x7(nn.Module):
    """The 7x7 stride-4 pad-3 patch embed as a space-to-depth GEMM.

    XLA's general conv lowering ran this at ~30x its bandwidth/FLOP roofline
    (1.86 ms/step profiled at 1024^2 — the overlapping-window gather
    dominates). Blocking the padded input into the 4x4 stride grid turns the
    conv into ONE lane-full [B*Ho*Wo, 64*Cin] @ [64*Cin, C] GEMM: every
    output pixel reads exactly two 4-blocks per axis (kernel 7 < 2*stride),
    so a 2x2 block-im2col covers the 7x7 receptive field with the kernel
    zero-padded to 8x8 taps. Parameter tree identical to nn.Conv
    (kernel HWIO + bias), so torch checkpoint conversion is unchanged.
    Matches reference hieradet.py PatchEmbed (kernel 7, stride 4, pad 3)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if h % 4 or w % 4:
            import jax
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(4, 4), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(y.dtype)
        ho, wo = h // 4, w // 4
        xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        xb = xp.reshape(b, ho + 2, 4, wo + 2, 4, cin)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, ho + 2, wo + 2,
                                                    16 * cin)
        p = jnp.concatenate([xb[:, i:i + ho, j:j + wo]
                             for i in (0, 1) for j in (0, 1)], axis=-1)
        k8 = jnp.zeros((8, 8, cin, self.features),
                       kernel.dtype).at[:7, :7].set(kernel)
        w2 = k8.reshape(2, 4, 2, 4, cin, self.features)
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(64 * cin, self.features)
        y = jnp.dot(p.reshape(b * ho * wo, 64 * cin).astype(self.dtype),
                    w2.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        y = y.astype(self.dtype) + bias.astype(self.dtype)
        return y.reshape(b, ho, wo, self.features)


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] spatial (q_pool path) or [Bw, T, C] token-major
        (window-major stage flow — tokens of one window per row group)."""
        tokens = x.ndim == 3
        if tokens:
            b, t, _ = x.shape
            h = w = None
            # 2-D operand: keeps the qkv GEMM + bias epilogue lane-major
            # (see MultiScaleBlock token path)
            x = x.reshape(b * t, x.shape[-1])
        else:
            b, h, w, _ = x.shape
            t = h * w
        from no_time_to_train_tpu.ops.quant import dense_cls
        D = dense_cls(self.quant)
        qkv = D(3 * self.dim_out, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(b, t, 3 * self.dim_out)
        d = self.dim_out
        nh = self.num_heads

        if self.q_pool:
            def heads(tt):
                return tt.reshape(b, tt.shape[1], nh, -1)

            q, k, v = (heads(qkv[..., :d]), heads(qkv[..., d:2 * d]),
                       heads(qkv[..., 2 * d:]))
            q = _max_pool_2x2(q.reshape(b, h, w, -1))
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, nh, -1)
            # q-pool blocks only run on the spatial path (the token-major
            # stage flow excludes them); result is already [b, h*w, nh, dh]
            out = sdpa_bnhd(q, k, v).reshape(b, h, w, -1)
            return D(self.dim_out, name="proj", dtype=self.dtype)(out)
        else:
            # head_dim (72 at Hiera dims) is not lane-aligned, so ANY
            # (heads, dh) split into sdpa's [B, H, N, D] layout is a real
            # relayout copy (profiled 2.9 ms/step even in the packed
            # do-it-once form). Windowed blocks (b = windows > 1; each
            # leading-dim row attends within itself) go through the
            # window-local kernel STRAIGHT off the packed qkv — no head
            # split at all (the split copies profiled ~2.8 ms/step, the
            # per-window XLA SDPA ~3.1). Global blocks (b == 1) and
            # fallbacks use sdpa_bnhd, which keeps q/k/v AND the result in
            # the [b, t, heads, dh] layout the qkv GEMM produces.
            from no_time_to_train_tpu.ops.attention import window_sdpa_qkv
            out_c = window_sdpa_qkv(qkv, heads=nh, win=t) if b > 1 else None
            if out_c is None:
                qkv = qkv.reshape(b, t, 3, nh, d // nh)
                out_c = sdpa_bnhd(qkv[:, :, 0], qkv[:, :, 1],
                                  qkv[:, :, 2]).reshape(b, t, d)
            if tokens:
                y = D(self.dim_out, name="proj",
                      dtype=self.dtype)(out_c.reshape(b * t, d))
                return y.reshape(b, t, self.dim_out)
            out = out_c.reshape(b, h, w, d)
            return D(self.dim_out, name="proj", dtype=self.dtype)(out)


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: bool = False
    window_size: int = 0
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, tokens=False):
        """Spatial path (tokens=False): x [B, H, W, C], handles q-pool /
        dim-change / windowing internally — the reference block semantics
        (hieradet.py:82-165).

        Token path (tokens=True): x [Bw, T, C] ALREADY window-partitioned by
        the stage driver (Hiera.__call__); only uniform blocks qualify
        (dim == dim_out, no q-pool). Global blocks arrive as [B, N, C] — full
        attention is permutation-invariant, so window-major token order is
        as good as raster order. Same submodules in the same trace order, so
        the parameter tree is identical to the spatial path."""
        if tokens:
            assert self.dim == self.dim_out and not self.q_stride
            # run the residual stream 2-D [Bw*T, C]: XLA assigns the 3-D
            # [Bw, T, C] intermediates packed layouts ({0,2,1}/{1,2,0}) that
            # put every bias/residual epilogue fusion 3-7x over its
            # bandwidth floor (profiled ~5 ms/step across stages); the flat
            # form keeps everything lane-major, and the reshapes at the
            # attention boundary are no-op views
            bw, t, c0 = x.shape
            x2 = x.reshape(bw * t, c0)
            xn = LayerNorm(eps=1e-6, name="norm1", dtype=self.dtype)(x2)
            xw = MultiScaleAttention(self.dim_out, self.num_heads,
                                     q_pool=False, name="attn",
                                     dtype=self.dtype)(xn.reshape(bw, t, c0))
            x2 = x2 + xw.reshape(bw * t, self.dim_out)
            xm = LayerNorm(eps=1e-6, name="norm2", dtype=self.dtype)(x2)
            x2 = x2 + MLP(int(self.dim_out * self.mlp_ratio), self.dim_out,
                          2, activation="gelu", name="mlp",
                          dtype=self.dtype, quant=self.quant)(xm)
            return x2.reshape(bw, t, self.dim_out)

        shortcut = x
        xn = LayerNorm(eps=1e-6, name="norm1", dtype=self.dtype)(x)

        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, name="proj", dtype=self.dtype)(xn)
            if self.q_stride:
                shortcut = _max_pool_2x2(shortcut)

        ws = self.window_size
        h, w = xn.shape[1], xn.shape[2]
        if ws > 0:
            xw, pad_hw = window_partition(xn, ws)
        else:
            xw = xn

        attn = MultiScaleAttention(self.dim_out, self.num_heads,
                                   q_pool=self.q_stride, name="attn",
                                   dtype=self.dtype, quant=self.quant)
        xw = attn(xw)

        if self.q_stride:
            ws = self.window_size // 2
            h, w = shortcut.shape[1:3]
            pad_h = (ws - h % ws) % ws if ws > 0 else 0
            pad_w = (ws - w % ws) % ws if ws > 0 else 0
            pad_hw = (h + pad_h, w + pad_w)

        if self.window_size > 0:
            xw = window_unpartition(xw, ws, pad_hw, (h, w))

        x = shortcut + xw
        xm = LayerNorm(eps=1e-6, name="norm2", dtype=self.dtype)(x)
        x = x + MLP(int(self.dim_out * self.mlp_ratio), self.dim_out, 2,
                    activation="gelu", name="mlp", dtype=self.dtype,
                    quant=self.quant)(xm)
        return x


class Hiera(nn.Module):
    """Returns per-stage feature maps [B, H_s, W_s, C_s], highest res first."""
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    q_pool: int = 3
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    return_interm_layers: bool = True
    force_spatial: bool = False   # disable the window-major stage flow
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"   # "int8": W8A8 block GEMMs (ops/quant.py)

    def setup(self):
        depth = sum(self.stages)
        self.stage_ends = [sum(self.stages[:i]) - 1
                           for i in range(1, len(self.stages) + 1)]
        self.q_pool_blocks = [x + 1
                              for x in self.stage_ends[:-1]][: self.q_pool]

        self.patch_proj = PatchEmbed7x7(self.embed_dim, name="patch_embed",
                                        dtype=self.dtype)
        bh, bw = self.window_pos_embed_bkg_spatial_size
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (bh, bw, self.embed_dim))
        ws0 = self.window_spec[0]
        self.pos_embed_window = self.param(
            "pos_embed_window", nn.initializers.zeros, (ws0, ws0, self.embed_dim))

        blocks = []
        embed_dim, num_heads = self.embed_dim, self.num_heads
        cur_stage = 1
        self.channel_list = []
        for i in range(depth):
            dim_out = embed_dim
            window_size = self.window_spec[cur_stage - 1]
            if self.global_att_blocks is not None and i in self.global_att_blocks:
                window_size = 0
            if i - 1 in self.stage_ends:
                dim_out = int(embed_dim * self.dim_mul)
                num_heads = int(num_heads * self.head_mul)
                cur_stage += 1
            blocks.append(MultiScaleBlock(
                dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                q_stride=(i in self.q_pool_blocks), window_size=window_size,
                name=f"blocks_{i}", dtype=self.dtype, quant=self.quant))
            embed_dim = dim_out
        self.blocks = blocks

    def _pos_embed_for(self, h, w):
        pe = resize(self.pos_embed.astype(jnp.float32)[None], (h, w),
                    mode="bicubic")[0]
        win = self.pos_embed_window
        tiles = (h // win.shape[0], w // win.shape[1], 1)
        pe = pe + jnp.tile(win, tiles)
        return pe.astype(self.dtype)

    def __call__(self, x):
        x = self.patch_proj(x)  # [B, H/4, W/4, C]
        x = x + self._pos_embed_for(x.shape[1], x.shape[2])
        outputs = []
        depth = len(self.blocks)
        q_pool_blocks = self.q_pool_blocks
        i = 0
        while i < depth:
            blk = self.blocks[i]
            transition = (i in q_pool_blocks
                          or blk.dim != blk.dim_out or blk.q_stride)
            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            ws = blk.window_size
            # Window-major stage flow: partition ONCE, run every uniform
            # block of the stage on token-major tensors (consecutive
            # partition/unpartition pairs are inverse permutations; global
            # attention is permutation-invariant), unpartition ONCE at the
            # stage end. Kills the per-block pack/unpack transposes that
            # profiled ~4 ms/step at the flagship shapes. Requires no
            # window padding; anything irregular falls back to the
            # per-block spatial path (identical math).
            run = []
            if (not self.force_spatial and not transition and ws > 0
                    and h % ws == 0 and w % ws == 0):
                j = i
                while j < depth:
                    bj = self.blocks[j]
                    if (bj.q_stride or bj.dim != bj.dim_out
                            or j in q_pool_blocks
                            or bj.window_size not in (0, ws)):
                        break
                    run.append(j)
                    if j in self.stage_ends:  # x must be spatial at stage
                        break                 # ends (FPN taps)
                    j += 1
            if len(run) > 1:
                xw, _ = window_partition(x, ws)           # [B*nw, ws, ws, C]
                nw = xw.shape[0] // b
                xw = xw.reshape(b * nw, ws * ws, -1)
                for j in run:
                    bj = self.blocks[j]
                    if bj.window_size == 0:               # global block
                        xg = xw.reshape(b, nw * ws * ws, -1)
                        xg = bj(xg, tokens=True)
                        xw = xg.reshape(b * nw, ws * ws, -1)
                    else:
                        xw = bj(xw, tokens=True)
                x = window_unpartition(
                    xw.reshape(b * nw, ws, ws, -1), ws, (h, w), (h, w))
                consumed = run
            else:
                x = blk(x)
                consumed = [i]
            for j in consumed:
                if (j == self.stage_ends[-1]) or (
                        j in self.stage_ends and self.return_interm_layers):
                    outputs.append(x)
            i = consumed[-1] + 1
        return outputs
