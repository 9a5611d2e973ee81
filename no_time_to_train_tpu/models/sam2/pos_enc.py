"""Position encodings: sine PE, random (Gaussian) PE, axial 2D RoPE.

Numerics match reference sam2/modeling/position_encoding.py:
  - PositionEmbeddingSine.forward  (:79-112)
  - PositionEmbeddingRandom        (:115-158)
  - compute_axial_cis/apply_rotary_enc (:174-221), re-expressed with real
    cos/sin rotations (TPU has no complex MXU path).

All are shape-static so XLA constant-folds them inside jit.
"""
import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

__all__ = [
    "sine_pos_embed_2d",
    "random_pe_grid",
    "random_pe_coords",
    "axial_rope_cos_sin",
    "apply_rotary",
    "sine_pe_1d",
]


@lru_cache(maxsize=None)
def _sine_pos_embed_2d_np(h: int, w: int, num_pos_feats: int, temperature: int,
                          normalize: bool, scale: float):
    npf = num_pos_feats // 2
    y_embed = np.tile(np.arange(1, h + 1, dtype=np.float32)[:, None], (1, w))
    x_embed = np.tile(np.arange(1, w + 1, dtype=np.float32)[None, :], (h, 1))
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(npf, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack((np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])), axis=3
                     ).reshape(h, w, -1)
    pos_y = np.stack((np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])), axis=3
                     ).reshape(h, w, -1)
    return np.concatenate((pos_y, pos_x), axis=2)  # [H, W, C]


def sine_pos_embed_2d(h, w, num_pos_feats, temperature=10000, normalize=True,
                      scale=None, dtype=jnp.float32):
    """[H, W, C] sine position embedding (reference returns NCHW; ours NHWC)."""
    if scale is None:
        scale = 2 * math.pi
    return jnp.asarray(
        _sine_pos_embed_2d_np(h, w, num_pos_feats, temperature, normalize, scale),
        dtype=dtype)


def random_pe_coords(coords01, gaussian_matrix):
    """Positionally encode [..., 2] coords normalized to [0,1].
    gaussian_matrix: [2, num_pos_feats]. Returns [..., 2*num_pos_feats]."""
    coords = 2.0 * coords01 - 1.0
    coords = coords @ gaussian_matrix.astype(coords01.dtype)
    coords = 2.0 * np.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def random_pe_grid(h, w, gaussian_matrix, dtype=jnp.float32):
    """[H, W, C] dense PE over a grid (pixel centers normalized)."""
    y = (jnp.arange(h, dtype=dtype) + 0.5) / h
    x = (jnp.arange(w, dtype=dtype) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [H, W, 2] (x, y)
    return random_pe_coords(grid, gaussian_matrix)


@lru_cache(maxsize=None)
def _axial_rope_np(dim: int, end_x: int, end_y: int, theta: float):
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float32) / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x, t_y = t % end_x, np.floor(t / end_x)
    ang_x = np.outer(t_x, freqs)
    ang_y = np.outer(t_y, freqs)
    ang = np.concatenate([ang_x, ang_y], axis=-1)  # [N, dim/2]
    return np.cos(ang), np.sin(ang)


def axial_rope_cos_sin(dim, end_x, end_y, theta=10000.0, dtype=jnp.float32):
    """cos/sin tables [end_x*end_y, dim//2] for 2D axial RoPE."""
    cos, sin = _axial_rope_np(dim, end_x, end_y, float(theta))
    return jnp.asarray(cos, dtype), jnp.asarray(sin, dtype)


def apply_rotary(x, cos, sin, repeat_freqs=1):
    """Rotate pairs in the last dim of x [..., N, D] by cos/sin [N0, D/2],
    where N = N0 * repeat_freqs (k-repeat for memory cross-attention)."""
    xf = x.astype(jnp.float32)
    x_pair = xf.reshape(*xf.shape[:-1], -1, 2)
    xe, xo = x_pair[..., 0], x_pair[..., 1]
    if repeat_freqs > 1:
        cos = jnp.tile(cos, (repeat_freqs, 1))
        sin = jnp.tile(sin, (repeat_freqs, 1))
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    oe = xe * cos - xo * sin
    oo = xe * sin + xo * cos
    out = jnp.stack([oe, oo], axis=-1).reshape(xf.shape)
    return out.astype(x.dtype)


def sine_pe_1d(pos, dim, temperature=10000):
    """reference sam2_utils.get_1d_sine_pe — [..., dim]."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos_embed = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pos_embed), jnp.cos(pos_embed)], axis=-1)
