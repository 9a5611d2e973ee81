"""Pallas kernel: fused second-deconv + skip-add + GELU + hypernetwork
product of the SAM2 mask decoder (reference mask_decoder.py output_upscaling
+ hypernetwork product, the profiled ~40% of grid-decode time).

For every prompt the dense path runs GEMM[hw*4, c1 -> 4*c2], adds the s0 skip
feature, GELUs, multiplies by the prompt's 1x[c2] hypernetwork vector and
reduces c2 — XLA lowers this as a tiny-channel convolution fusion at ~8
TFLOP/s (c2=32 pads the lane dim 4x). This kernel keeps the GEMM output
entirely in VMEM in its natural [rows, 4*c2(=128)] lane-full layout, applies
the epilogue in registers, and emits the four (dy2, dx2) output phases with
rows on the lane axis — the final interleave to [B, 4h, 4w] is one cheap XLA
transpose.

STATUS: experimental, NOT wired into the decoder. Measured on one v5e at the
flagship shapes (B=256, h=w=64): ~63 ms vs the in-pipeline XLA conv fusion's
~9 ms/chunk — the sequential Pallas grid plus the fp32 epilogue through the
VPU dominates; prompt-blocking and parallel dimension_semantics did not move
it. Kept (with an interpret-mode correctness test) as the starting point for
a round-2 attempt via pltpu.emit_pipeline or a bf16 epilogue.

Row convention: `u` rows are (y, x, dy1, dx1)-major, i.e. u comes from the
first deconv's un-shuffled GEMM layout (see MaskDecoder.
_upscale_product_unshuffled); `k2` columns are (dy2, dx2, c2)."""
import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (abs err <= 1.5e-7): Mosaic
    lowers neither erf nor erfc, and exp is available. The deviation from
    XLA's erf is far below bf16 resolution and mask-threshold sensitivity."""
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact-gelu shape: x * Phi(x); jax.nn.gelu(approximate=False) routes
    # through erfc, which Mosaic does not lower — use the rational erf
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kernel(u_ref, k2_ref, bias_ref, s0_ref, hyp_ref, o_ref, *, c2):
    pb, r, c1 = u_ref.shape
    u = u_ref[...].reshape(pb * r, c1)
    z = jnp.dot(u, k2_ref[...], preferred_element_type=jnp.float32)
    z = z.reshape(pb, r, 4 * c2)
    z = z + bias_ref[...].astype(jnp.float32)
    z = z + s0_ref[...].astype(jnp.float32)        # [1, R, 4*c2] broadcasts
    g = _gelu(z)                                   # [PB, R, 4*c2] fp32
    hyp = hyp_ref[:, 0, :].astype(jnp.float32)     # [PB, c2]
    for k in range(4):
        mk = (g[..., k * c2:(k + 1) * c2] * hyp[:, None, :]).sum(axis=-1)
        o_ref[:, k, :] = mk.astype(o_ref.dtype)


def upscale_product(u, k2mat, bias4, s0u, hyper, h, w, *, tile_y=4,
                    prompt_block=8, interpret=False):
    """u: [B, h*w*4, c1] (rows (y, x, dy1, dx1)); k2mat: [c1, 4*c2] (cols
    (dy2, dx2, c2)); bias4: [4*c2] (tiled deconv bias); s0u: [1, h*w*4, 4*c2]
    skip features in the same layout (zeros if unused); hyper: [B, c2].
    Returns mask [B, 4h, 4w] fp32."""
    b, rows, c1 = u.shape
    c2 = hyper.shape[-1]
    assert rows == h * w * 4 and k2mat.shape == (c1, 4 * c2)
    while h % tile_y:
        tile_y //= 2
    pb = prompt_block
    while b % pb:
        pb //= 2
    blk_r = tile_y * w * 4
    grid = (b // pb, h // tile_y)

    out = pl.pallas_call(
        functools.partial(_kernel, c2=c2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pb, blk_r, c1), lambda p, t: (p, t, 0)),
            pl.BlockSpec((c1, 4 * c2), lambda p, t: (0, 0)),
            pl.BlockSpec((4 * c2,), lambda p, t: (0,)),
            pl.BlockSpec((1, blk_r, 4 * c2), lambda p, t: (0, t, 0)),
            pl.BlockSpec((pb, 1, c2), lambda p, t: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((pb, 4, blk_r), lambda p, t: (p, 0, t)),
        out_shape=jax.ShapeDtypeStruct((b, 4, rows), jnp.float32),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")))),
    )(u, k2mat, bias4, s0u, hyper[:, None, :])

    # [B, (dy2,dx2), (y,x,dy1,dx1)] -> [B, 4h, 4w]
    m = out.reshape(b, 2, 2, h, w, 2, 2)
    return m.transpose(0, 3, 5, 1, 4, 6, 2).reshape(b, 4 * h, 4 * w)


def upscale_product_xla(u, k2mat, bias4, s0u, hyper, h, w):
    """Pure-XLA reference of the same contraction (for tests/fallback)."""
    b, rows, c1 = u.shape
    c2 = hyper.shape[-1]
    z = jnp.einsum("brc,cm->brm", u, k2mat.astype(u.dtype)).astype(jnp.float32)
    z = z + bias4.astype(jnp.float32) + s0u.astype(jnp.float32)
    g = jax.nn.gelu(z, approximate=False)
    m4 = jnp.einsum("brkc,bc->bkr", g.reshape(b, rows, 4, c2),
                    hyper.astype(jnp.float32))
    m = m4.reshape(b, 2, 2, h, w, 2, 2)
    return m.transpose(0, 3, 5, 1, 4, 6, 2).reshape(b, 4 * h, 4 * w)
