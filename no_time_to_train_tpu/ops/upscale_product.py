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

import numpy as np
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


def _fused_kernel(src_ref, k1_ref, b1_ref, s1_ref, lnw_ref, lnb_ref,
                  k2_ref, b2_ref, s0_ref, hyp_ref, sel_ref, o_ref,
                  *, c1, c2, eps):
    """One block: pb prompts x pt positions of the FULL upscale chain.

    src [pb, pt, d] -> for each (dy1, dx1) quarter q:
      t1_q = src @ k1[:, q]            (MXU, K=d)
      u_q  = gelu(ln(t1_q + s1_q))     (VPU, LN over c1)
      g_q  = gelu(u_q @ k2 + b2 + s0_q)  (MXU K=c1, VPU)
      out[p, q, s, :] = g_q[p] @ (hyper_p as block-diag)  (MXU, transposed
        so positions land on the lane axis)
    Everything stays in VMEM; only the [pb, 16, pt] mask leaves.
    """
    pb, pt, d = src_ref.shape
    src = src_ref[...].reshape(pb * pt, d)
    sel = sel_ref[...]                       # [4*c2, 8] block-diag selector
    for q in range(4):
        k1q = k1_ref[:, q * c1:(q + 1) * c1]
        t1 = jnp.dot(src, k1q, preferred_element_type=jnp.float32)
        t1 = t1 + b1_ref[0, q * c1:(q + 1) * c1].astype(jnp.float32)
        s1q = s1_ref[:, q * c1:(q + 1) * c1].astype(jnp.float32)
        t1 = t1.reshape(pb, pt, c1) + s1q[None]
        # LayerNorm over c1 (population var, eps inside rsqrt)
        mu = t1.mean(axis=-1, keepdims=True)
        var = jnp.square(t1 - mu).mean(axis=-1, keepdims=True)
        t1 = (t1 - mu) * jax.lax.rsqrt(var + eps)
        t1 = t1 * lnw_ref[0].astype(jnp.float32) \
            + lnb_ref[0].astype(jnp.float32)
        u = _gelu(t1).reshape(pb * pt, c1).astype(k2_ref.dtype)

        t2 = jnp.dot(u, k2_ref[...], preferred_element_type=jnp.float32)
        t2 = t2 + b2_ref[0].astype(jnp.float32)
        s0q = s0_ref[:, q, :].astype(jnp.float32)
        g = _gelu(t2.reshape(pb, pt, 4 * c2) + s0q[None])
        # scale by the prompt's tiled hypernetwork vector, then contract the
        # (s, c) axis with the shared block-diag selector on the MXU,
        # transposed so positions land on the lane axis
        gh = (g * hyp_ref[...][:, None, :].astype(jnp.float32)) \
            .astype(src_ref.dtype)
        for p in range(pb):
            mk = jax.lax.dot_general(
                sel, gh[p], (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [8, pt]
            o_ref[p, q * 4:(q + 1) * 4, :] = mk[:4].astype(o_ref.dtype)


def fused_upscale_mask(src_flat, k1mat, bias1, s1u, ln_w, ln_b, k2mat, bias2,
                       s0u, hyper, h, w, *, eps=1e-6, prompt_block=8,
                       pos_block=512, interpret=False):
    """Fully-fused mask upscale: both deconvs + LN + skips + GELUs +
    hypernetwork product of the SAM2 decoder in ONE Pallas kernel.

    The XLA lowering of this chain materializes the [B, h*w*4, 4*c2]
    pre-product tensor (~1 GB/chunk) in HBM with a prompt-minor layout that
    runs the deconv2 GEMM ~6x off roofline (profiled 12.4 ms/chunk); here
    nothing larger than the [B, hw, 16] mask leaves VMEM.

    src_flat: [B, h*w, d] transformer image output (per-prompt);
    k1mat: [d, 4*c1] cols (dy1, dx1, c1); bias1: [4*c1] (dc1 bias tiled);
    s1u: [h*w, 4*c1] unshuffled skip (zeros if unused); ln_w/ln_b: [c1];
    k2mat: [c1, 4*c2] cols (dy2, dx2, c2); bias2: [4*c2]; s0u: [h*w, 4, 4*c2]
    (pos, (dy1 dx1), (dy2 dx2 c2)); hyper: [B, c2].
    Returns mask [B, 4h, 4w] (src dtype).
    """
    b, hw, d = src_flat.shape
    c2 = hyper.shape[-1]
    c1 = k2mat.shape[0]
    assert hw == h * w and k1mat.shape == (d, 4 * c1)
    assert s0u.shape == (hw, 4, 4 * c2) and s1u.shape == (hw, 4 * c1)
    pb = prompt_block
    while b % pb:
        pb //= 2
    pt = pos_block
    while hw % pt:
        pt //= 2
    grid = (b // pb, hw // pt)
    # block-diagonal selector sel[(s, c), s'] = 1 iff s == s' (8 cols: the
    # MXU needs a >=8 minor dim; cols 4..7 are discarded)
    sel = (np.arange(4 * c2)[:, None] // c2 == np.arange(8)[None]) \
        .astype(np.float32)
    dt = src_flat.dtype
    sel = jnp.asarray(sel, dt)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, c1=c1, c2=c2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pb, pt, d), lambda p, t: (p, t, 0)),
            pl.BlockSpec((d, 4 * c1), lambda p, t: (0, 0)),
            pl.BlockSpec((1, 4 * c1), lambda p, t: (0, 0)),
            pl.BlockSpec((pt, 4 * c1), lambda p, t: (t, 0)),
            pl.BlockSpec((1, c1), lambda p, t: (0, 0)),
            pl.BlockSpec((1, c1), lambda p, t: (0, 0)),
            pl.BlockSpec((c1, 4 * c2), lambda p, t: (0, 0)),
            pl.BlockSpec((1, 4 * c2), lambda p, t: (0, 0)),
            pl.BlockSpec((pt, 4, 4 * c2), lambda p, t: (t, 0, 0)),
            pl.BlockSpec((pb, 4 * c2), lambda p, t: (p, 0)),
            pl.BlockSpec((4 * c2, 8), lambda p, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((pb, 16, pt), lambda p, t: (p, 0, t)),
        out_shape=jax.ShapeDtypeStruct((b, 16, hw), dt),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")))),
    )(src_flat, k1mat.astype(dt), bias1[None].astype(dt), s1u.astype(dt),
      ln_w[None].astype(dt), ln_b[None].astype(dt), k2mat.astype(dt),
      bias2[None].astype(dt), s0u.astype(dt),
      jnp.tile(hyper, (1, 4)).astype(jnp.float32), sel)

    # [B, (dy1 dx1 dy2 dx2), (y x)] -> [B, (y dy1 dy2), (x dx1 dx2)]
    m = out.reshape(b, 2, 2, 2, 2, h, w)
    return m.transpose(0, 5, 1, 3, 6, 2, 4).reshape(b, 4 * h, 4 * w)


def fused_upscale_mask_xla(src_flat, k1mat, bias1, s1u, ln_w, ln_b, k2mat,
                           bias2, s0u, hyper, h, w, *, eps=1e-6):
    """Pure-XLA same-contraction reference for the fused kernel (tests)."""
    b, hw, d = src_flat.shape
    c2 = hyper.shape[-1]
    c1 = k2mat.shape[0]
    t1 = jnp.einsum("bpd,dm->bpm", src_flat,
                    k1mat.astype(src_flat.dtype)).astype(jnp.float32)
    t1 = t1 + bias1.astype(jnp.float32) + s1u.astype(jnp.float32)[None]
    t1 = t1.reshape(b, hw, 4, c1)
    mu = t1.mean(-1, keepdims=True)
    var = jnp.square(t1 - mu).mean(-1, keepdims=True)
    t1 = (t1 - mu) * jax.lax.rsqrt(var + eps)
    t1 = t1 * ln_w.astype(jnp.float32) + ln_b.astype(jnp.float32)
    u = jax.nn.gelu(t1, approximate=False)
    t2 = jnp.einsum("bpqc,cm->bpqm", u.astype(src_flat.dtype),
                    k2mat.astype(src_flat.dtype)).astype(jnp.float32)
    t2 = t2 + bias2.astype(jnp.float32) + s0u.astype(jnp.float32)[None]
    g = jax.nn.gelu(t2, approximate=False)
    mk = jnp.einsum("bpqsc,bc->bpqs", g.reshape(b, hw, 4, 4, c2),
                    hyper.astype(jnp.float32))
    h_ = h
    m = mk.reshape(b, h_, hw // h_, 2, 2, 2, 2)
    return m.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
        b, 4 * h_, 4 * (hw // h_)).astype(src_flat.dtype)


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
