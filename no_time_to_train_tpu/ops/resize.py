"""Torch/PIL-parity image resize as matmuls (MXU-friendly).

The reference pipeline mixes several resize flavours whose exact semantics
matter for AP parity (see reference Sam2MatchingBaseline_noAMG.py:456-469,
552-558, 657-663 and sam2/modeling/backbones/hieradet.py:268):

  - F.interpolate(mode="bicubic", align_corners=False)          (a = -0.75)
  - F.interpolate(mode="bilinear", align_corners=False, antialias=True/False)
  - F.interpolate(mode="nearest")

On TPU we express a separable resize as two dense matmuls with precomputed
[out, in] weight matrices: y = W_h @ x @ W_w^T. Static shapes, exact weights,
and XLA maps it straight onto the MXU. Weight matrices are built in float64
numpy at trace time and cached.

For runtime-varying output sizes (final mask upsample to original image size)
see `resize_bilinear_dynamic` which uses a gather-based kernel with traced
scale scalars into a static padded output buffer.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "resize",
    "resize_matrix",
    "resize_bilinear_dynamic",
]


def _kernel_bilinear(x):
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


def _kernel_bicubic(x, a=-0.75):
    # torch's bicubic uses the Keys cubic kernel with a = -0.75
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


_KERNELS = {
    "bilinear": (_kernel_bilinear, 1.0),
    "bicubic": (_kernel_bicubic, 2.0),
}


@lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int, mode: str, antialias: bool):
    """[out_size, in_size] float64 weight matrix matching torch F.interpolate."""
    if mode == "nearest":
        # torch nearest: src = floor(dst * in/out)
        w = np.zeros((out_size, in_size))
        idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        w[np.arange(out_size), idx] = 1.0
        return w

    kernel, support = _KERNELS[mode]
    scale = in_size / out_size
    use_aa = antialias and scale > 1.0
    fscale = scale if use_aa else 1.0
    ksupport = support * fscale

    w = np.zeros((out_size, in_size))
    for i in range(out_size):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - ksupport)) + 1
        hi = int(np.ceil(center + ksupport)) + 1
        ks = np.arange(lo, hi)
        weights = kernel((ks - center) / fscale) / fscale
        if use_aa:
            # PIL/torch-antialias: window clipped to valid range, renormalized
            valid = (ks >= 0) & (ks < in_size)
            ks, weights = ks[valid], weights[valid]
            s = weights.sum()
            if s > 0:
                weights = weights / s
            np.add.at(w[i], ks, weights)
        else:
            # torch non-antialias: replicate-clamp source indices
            ks = np.clip(ks, 0, in_size - 1)
            np.add.at(w[i], ks, weights)
    return w


def resize_matrix(in_size: int, out_size: int, mode: str = "bilinear",
                  antialias: bool = False, dtype=jnp.float32):
    return jnp.asarray(_resize_matrix_np(in_size, out_size, mode, bool(antialias)),
                       dtype=dtype)


def resize(x, out_hw, mode: str = "bilinear", antialias: bool = False):
    """Resize the trailing-2-of-3 spatial dims of an NHWC (or HWC / ...HWC) array.

    Operates on axes (-3, -2): x has shape [..., H, W, C]; returns
    [..., out_h, out_w, C]. Matches torch F.interpolate(align_corners=False)
    semantics for the given mode/antialias (torch applies antialias only when
    downsampling; we reproduce that).
    """
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    cdt = jnp.float32 if x.dtype not in (jnp.float32, jnp.float64) else x.dtype
    y = x.astype(cdt)
    if h != out_h:
        wh = resize_matrix(h, out_h, mode, antialias, dtype=cdt)
        y = jnp.einsum("oh,...hwc->...owc", wh, y)
    if w != out_w:
        ww = resize_matrix(w, out_w, mode, antialias, dtype=cdt)
        y = jnp.einsum("ow,...hwc->...hoc", ww, y)
    return y.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else y


def resize_hw(x, out_hw, mode: str = "bilinear", antialias: bool = False):
    """Resize the last two dims of [..., H, W] (mask/logit stacks)."""
    y = resize(x[..., None], out_hw, mode=mode, antialias=antialias)
    return y[..., 0]


def resize_bilinear_dynamic(x, out_buf_hw, out_h, out_w):
    """Bilinear resize [..., H, W] -> a static [..., BH, BW] buffer whose
    top-left (out_h, out_w) region (runtime scalars) holds the resized image;
    the rest is zero. align_corners=False, no antialias (the reference's final
    mask upsample is an upsample for virtually all images, where torch's
    antialias flag is a no-op).
    """
    in_h, in_w = x.shape[-2], x.shape[-1]
    bh, bw = out_buf_hw
    out_h = jnp.asarray(out_h, jnp.float32)
    out_w = jnp.asarray(out_w, jnp.float32)

    def axis_coords(buf_n, out_n, in_n):
        i = jnp.arange(buf_n, dtype=jnp.float32)
        src = (i + 0.5) * (in_n / out_n) - 0.5
        src = jnp.clip(src, 0.0, in_n - 1.0)
        lo = jnp.floor(src)
        frac = src - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        valid = i < out_n
        return lo, hi, frac, valid

    ylo, yhi, yf, yv = axis_coords(bh, out_h, in_h)
    xlo, xhi, xf, xv = axis_coords(bw, out_w, in_w)

    x = x.astype(jnp.float32)
    top = x[..., ylo, :] * (1.0 - yf)[:, None] + x[..., yhi, :] * yf[:, None]
    out = top[..., :, xlo] * (1.0 - xf) + top[..., :, xhi] * xf
    mask = (yv[:, None] & xv[None, :]).astype(jnp.float32)
    return out * mask
