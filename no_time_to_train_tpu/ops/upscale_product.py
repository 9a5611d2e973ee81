"""Pallas kernel: the SAM2 mask-decoder upscale chain after the first-deconv
GEMM — LayerNorm + GELU + second deconv + skips + GELU + hypernetwork product
(reference mask_decoder.py output_upscaling + the per-prompt mask product,
the profiled ~40% of grid-decode time).

Design (v3, the wired version): the decoder computes the first deconv as one
lane-full GEMM [B*hw, d] @ [d, 4*c1] (cols (dy1, dx1, c1)); this kernel
consumes that RAW output and keeps everything else in VMEM:

  * LayerNorm over each 64-wide c1 segment with the statistics computed as
    MXU dots against segment indicators — [rows, 256] stays lane-full, no
    cross-lane VPU reductions;
  * the second deconv runs as four lane-sliced K=c1 GEMMs against the
    shared [c1, 4*c2] k2 (a 4x block-diagonal single-GEMM variant was
    measured 4x the FLOPs and ~5.6 ms/chunk of MXU time);
  * the hypernetwork product folds the prompt's tiled hyper vector
    elementwise and contracts (phase, c2) with a [16*c2, 16] indicator on
    the MXU; the wired path (`out_16pt`) emits the 16 subpixel phases on
    SUBLANES with positions on full lanes (the [.., pt, 16] orientation
    masks 16/128 lanes per store, measured 0.6 ms/chunk slower).

Only the [B, 16, hw] mask phases leave VMEM (~67 MB/chunk vs the ~2.7 GB of
XLA intermediates).

Measured history at flagship decode shapes (B=256 prompts, 64x64 grid,
d=256, one v5e):
  * XLA 8-d einsum form (round 1): ~12.4 ms/chunk in-pipeline, but its
    half-lane (c2-minor) intermediates pad 4x to the 128-lane tile;
  * full-chain Pallas kernel incl. the t1 GEMM: 18.4 ms/chunk — the
    per-quarter N=64 GEMMs and cross-lane VPU LayerNorm dominate;
  * flat GEMM + Pallas product epilogue only: 8.7 ms/chunk isolated, but
    in-context the upstream half-lane LN/GELU fusion (17 ms/step) and the
    materialized t2 GEMM (16.7 ms/step) erased the win (bench 214 vs 205
    ms/img);
  * this kernel: see ARCHITECTURE.md round-2 measurements.

Mosaic notes: erf/erfc do not lower — the rational-erf helper below is the
workaround (abs err <= 1.5e-7, far below bf16 resolution).
"""
import contextvars
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


# Phi(x) - 0.5 = x * P(x^2) on |x| <= 3*sqrt(2): degree-9 Chebyshev LSQ fit
# (f32 Horner max |gelu - exact| = 3.1e-4 over the whole real line, clamp
# included — an order below bf16 output rounding at mask-logit magnitudes)
_PHI_POLY = (3.989414573e-01, -6.648048759e-02, 9.953580797e-03,
             -1.171503449e-03, 1.089480938e-04, -7.869794899e-06,
             4.209101405e-07, -1.541792294e-08, 3.401560145e-10,
             -3.372953826e-12)
_PHI_CLAMP = 3.0 * (2.0 ** 0.5)


def _gelu_fast(x):
    """Polynomial exact-shape gelu for the bf16 compute path: ~13 VPU ops vs
    ~35 for the exp-based rational erf (the kernel is VPU-bound — the two
    gelu evaluations over 768 f32 lanes/row are its measured floor). Max abs
    deviation from exact gelu is 3.1e-4, below bf16 output rounding; the f32
    path keeps `_gelu` so the 3e-5 parity anchors stay exact."""
    xc = jnp.clip(x, -_PHI_CLAMP, _PHI_CLAMP)
    t = xc * xc
    acc = jnp.full_like(t, _PHI_POLY[-1])
    for c in _PHI_POLY[-2::-1]:
        acc = acc * t + c
    return x * (0.5 + xc * acc)


def _gelu_tanh(x):
    """tanh-approximate gelu for the bf16 compute path: ~9 VPU ops with a
    hardware tanh (Mosaic lowers tanh natively, unlike erf). Max abs
    deviation from exact gelu ~3e-3 — at bf16 output rounding magnitude,
    same approximation the bf16 encoder MLPs use (common._gelu_act)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * (x * x * x))))


# contextvars (not a module global): the runner traces from a
# ThreadPoolExecutor, so a no_fusion() training trace in one thread must not
# flip dispatch for an inference trace running concurrently in another
_NO_FUSION_DEPTH = contextvars.ContextVar("nttt_no_fusion_depth", default=0)


def no_fusion():
    """Context manager disabling the fused Pallas decode paths for whatever
    is TRACED inside it. The kernels have no JVP/VJP rules, so any
    differentiated decode (SAM2Ref training) must trace the XLA formulations
    instead; wrap the `value_and_grad` call site (inside jit is fine — the
    flag is only read at trace time)."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        tok = _NO_FUSION_DEPTH.set(_NO_FUSION_DEPTH.get() + 1)
        try:
            yield
        finally:
            _NO_FUSION_DEPTH.reset(tok)
    return _ctx()


def fusion_disabled():
    return _NO_FUSION_DEPTH.get() > 0


def default_device_is_cpu():
    """True when computations default to the CPU backend — either because CPU
    is the only platform or because jax_default_device is pinned to a CPU
    device (the test/dryrun convention on hosts with a remote TPU attached,
    where jax.default_backend() alone still reports the TPU)."""
    d = jax.config.jax_default_device
    if d is not None:
        return getattr(d, "platform", str(d)) == "cpu"
    return jax.default_backend() == "cpu"


def _chain_body(t1, pb, pt, m1, s1_ref, lnwsegT_ref, lnb4_ref, k2bd_ref,
                s0_ref, hyp_ref, segln_ref, seglnT_ref, seg16_ref,
                o_ref, eps):
    """Shared post-t1 chain on an in-VMEM [pb*pt, 4*c1] t1 block.

    The kernel is VPU-bound, so every elementwise pass over the 768
    lanes/row counts; three passes ride shared operands instead:
    the deconv biases are pre-added into the s1/s0 skips at trace time
    (fused_post_t1), the LN weight is folded into the inv-broadcast
    indicator (the MXU dot applies it), and the per-prompt hypernetwork
    vector multiplies the 16-row phase indicator, not the [pt, 16*c2]
    activation block."""
    z3 = (t1.reshape(pb, pt, m1).astype(jnp.float32)
          + s1_ref[...].astype(jnp.float32)[None])
    z = z3.reshape(pb * pt, m1)
    segln = segln_ref[...]                       # [m1, 8], 1/c1 on segment
    mu = jnp.dot(z, segln, preferred_element_type=jnp.float32)
    ex2 = jnp.dot(z * z, segln, preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
    seglnT = seglnT_ref[...]                     # [8, m1] indicator
    mub = jnp.dot(mu, seglnT, preferred_element_type=jnp.float32)
    # [8, m1] indicator pre-scaled by ln_w: broadcasts inv AND applies the
    # LN weight in the same MXU pass (one fewer full-lane VPU multiply)
    invw = jnp.dot(inv, lnwsegT_ref[...], preferred_element_type=jnp.float32)
    zn = (z - mub) * invw + lnb4_ref[0].astype(jnp.float32)
    # dtype is a trace-time constant: bf16 compute takes the cheap
    # hardware-tanh gelu, the f32 (test/CPU) path keeps the exact-rational
    # one so the 3e-5 parity anchors stay exact
    act = _gelu_tanh if k2bd_ref.dtype == jnp.bfloat16 else _gelu
    u = act(zn).astype(k2bd_ref.dtype)

    # second deconv: each (dy1, dx1) quarter contracts its own c1 block.
    # Four lane-sliced K=c1 GEMMs beat one [4c1, 16c2] block-diagonal GEMM —
    # the block-diag form burns 4x the FLOPs (measured 1.1 TFLOP/chunk,
    # ~5.6 ms of MXU time at flagship shapes, for 69 GFLOP of useful work)
    c1 = m1 // 4
    k2 = k2bd_ref[...]
    t2 = jnp.concatenate(
        [jnp.dot(u[:, q * c1:(q + 1) * c1], k2,
                 preferred_element_type=jnp.float32) for q in range(4)],
        axis=-1)
    m2 = t2.shape[-1]
    z2 = (t2.reshape(pb, pt, m2)
          + s0_ref[...].astype(jnp.float32)[None])
    ga = act(z2)
    if o_ref.shape[1] == 16:
        # transposed output [pb, 16, pt]: the product lands the 16 subpixel
        # phases on SUBLANES and positions on full lanes, so the output
        # stores are lane-full (a [.., pt, 16] layout masks 16/128 lanes).
        # The prompt's hyper vector folds into the [16, m2] indicator
        # OPERAND of the phase contraction — 16 rows instead of a full
        # [pt, m2] elementwise pass. Exact on the f32 path (seg entries
        # are 0/1); on the bf16 path segTh and gh round separately where
        # the unfolded form rounded their f32 product once — within the
        # test tolerances but not bit-identical to the pre-fold kernel.
        gh = ga.astype(seg16_ref.dtype)
        segT = seg16_ref[...].T
        for p in range(pb):
            segTh = (segT.astype(jnp.float32)
                     * hyp_ref[p][None]).astype(seg16_ref.dtype)
            mk = jax.lax.dot_general(segTh, gh[p],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_ref[p] = mk.astype(o_ref.dtype)          # [16, pt]
    else:
        g = ga * hyp_ref[...][:, None, :]
        mask = jnp.dot(g.reshape(pb * pt, m2).astype(seg16_ref.dtype),
                       seg16_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = mask.reshape(pb, pt, 16).astype(o_ref.dtype)


def _post_t1_kernel(t1_ref, s1_ref, lnwsegT_ref, lnb4_ref, k2bd_ref,
                    s0_ref, hyp_ref, segln_ref, seglnT_ref,
                    seg16_ref, o_ref, *, eps):
    """One [pb, pt, 4*c1] block of the post-t1 chain (see module doc)."""
    pb, pt, m1 = t1_ref.shape
    _chain_body(t1_ref[...].reshape(pb * pt, m1), pb, pt, m1, s1_ref,
                lnwsegT_ref, lnb4_ref, k2bd_ref, s0_ref, hyp_ref,
                segln_ref, seglnT_ref, seg16_ref, o_ref, eps)


def _from_src_kernel(src_ref, k1_ref, s1_ref, lnwsegT_ref, lnb4_ref,
                     k2bd_ref, s0_ref, hyp_ref, segln_ref,
                     seglnT_ref, seg16_ref, o_ref, *, eps):
    """Like _post_t1_kernel but computes the first-deconv GEMM in-kernel
    (K=d, N=4*c1 — a full-MXU op), so the [B, hw, 4*c1] t1 tensor never
    reaches HBM: input is the transformer's src_out block [pb, pt, d].

    t1 stays f32 out of the MXU (the downstream chain recasts to f32
    anyway, so the bf16 round-trip was two pure-overhead VPU passes; LN
    normalization makes the sub-bf16-ulp drift vs the XLA formulation
    invisible at the 0.1 differential tolerance)."""
    pb, pt, d = src_ref.shape
    m1 = k1_ref.shape[1]
    t1 = jnp.dot(src_ref[...].reshape(pb * pt, d), k1_ref[...],
                 preferred_element_type=jnp.float32)
    _chain_body(t1, pb, pt, m1, s1_ref, lnwsegT_ref, lnb4_ref, k2bd_ref,
                s0_ref, hyp_ref, segln_ref, seglnT_ref, seg16_ref,
                o_ref, eps)


def fused_post_t1(t1, bias1_4, s1f, ln_w, ln_b, k2mat, bias2, s0f16, hyper,
                  *, k1mat=None, eps=1e-6, prompt_block=8, pos_block=256,
                  out_16pt=False, interpret=False):
    """Fused LN + GELU + second deconv + skip + GELU + hypernetwork product,
    consuming the RAW first-deconv GEMM output.

    t1: [B, hw, 4*c1] (rows (y, x), cols (dy1, dx1, c1) — the lane-full GEMM
    layout of MaskDecoder._upscale_product_unshuffled); bias1_4: [4*c1] tiled
    dc1 bias; s1f: [hw, 4*c1] unshuffled s1 skip (zeros if unused);
    ln_w/ln_b: [c1]; k2mat: [c1, 4*c2] cols (dy2, dx2, c2); bias2: [c2];
    s0f16: [hw, 16*c2] cols (dy1, dx1, dy2, dx2, c2) (zeros if unused);
    hyper: [B, c2]. Returns mask [B, hw, 16] (t1 dtype), cols
    (dy1, dx1, dy2, dx2) — the caller interleaves to [B, 4h, 4w].

    When `k1mat` ([d, 4*c1]) is given, the first argument is the
    transformer's src_out [B, hw, d] instead of t1 and the first-deconv GEMM
    runs in-kernel — the [B, hw, 4*c1] t1 never reaches HBM."""
    b, hw, m_in = t1.shape
    c2 = k2mat.shape[1] // 4
    m1 = m_in if k1mat is None else k1mat.shape[1]
    c1 = m1 // 4
    assert k2mat.shape == (c1, 4 * c2) and s1f.shape == (hw, m1)
    assert s0f16.shape == (hw, 16 * c2) and hyper.shape == (b, c2)
    pb = prompt_block
    while b % pb:
        pb //= 2
    pt = pos_block
    while hw % pt:
        pt //= 2
    if not interpret and pb % 8 and pb != b:
        # Mosaic needs the prompt block sublane-divisible; odd prompt counts
        # (never the flagship 256/chunk) take the XLA formulation
        if k1mat is not None:
            t1 = jnp.einsum("bhd,dm->bhm", t1, k1mat.astype(t1.dtype),
                            preferred_element_type=t1.dtype)
        return fused_post_t1_xla(t1, bias1_4, s1f, ln_w, ln_b, k2mat, bias2,
                                 s0f16, hyper, eps=eps)
    # position-tile OUTER, prompt-block INNER: the shared skip blocks
    # (s1f/s0f16, ~6 MB combined at flagship shapes) are indexed by t only,
    # so they are DMA'd once per position tile and stay VMEM-resident across
    # the whole prompt sweep — the (p, t) order re-fetched them for every
    # prompt block (~190 MB/chunk of redundant HBM reads)
    grid = (hw // pt, b // pb)
    dt = t1.dtype

    k2bd = k2mat.astype(dt)                  # [c1, 4*c2], shared per quarter
    seg = np.repeat(np.arange(4), c1)
    segln = (seg[:, None] == np.arange(8)[None]).astype(np.float32) / c1
    seglnT = (np.arange(8)[:, None] == seg[None]).astype(np.float32)
    seg16 = np.repeat(np.arange(16), c2)
    seg16 = (seg16[:, None] == np.arange(16)[None]).astype(np.float32)

    # the deconv biases fold into the (position-tile-resident, f32) skip
    # operands at trace time: one fewer elementwise pass per lane group in
    # the VPU-bound kernel, same sums up to add associativity
    s1p = s1f.astype(jnp.float32) + bias1_4.astype(jnp.float32)[None]
    s0p = (s0f16.astype(jnp.float32)
           + jnp.tile(bias2, 16).astype(jnp.float32)[None])
    specs = [
        pl.BlockSpec((pb, pt, m_in), lambda t, p: (p, t, 0)),
        pl.BlockSpec((pt, m1), lambda t, p: (t, 0)),
        pl.BlockSpec((8, m1), lambda t, p: (0, 0)),
        pl.BlockSpec((1, m1), lambda t, p: (0, 0)),
        pl.BlockSpec((c1, 4 * c2), lambda t, p: (0, 0)),
        pl.BlockSpec((pt, 16 * c2), lambda t, p: (t, 0)),
        pl.BlockSpec((pb, 16 * c2), lambda t, p: (p, 0)),
        pl.BlockSpec((m1, 8), lambda t, p: (0, 0)),
        pl.BlockSpec((8, m1), lambda t, p: (0, 0)),
        pl.BlockSpec((16 * c2, 16), lambda t, p: (0, 0)),
    ]
    # ln_w folds into the inv-broadcast indicator so the MXU dot applies
    # the LN weight for free (see _chain_body)
    lnwsegT = jnp.asarray(seglnT) * jnp.tile(ln_w, 4)[None].astype(jnp.float32)
    operands = [
        t1, s1p, lnwsegT,
        jnp.tile(ln_b, 4)[None].astype(jnp.float32),
        k2bd, s0p, jnp.tile(hyper, (1, 16)).astype(jnp.float32),
        jnp.asarray(segln), jnp.asarray(seglnT), jnp.asarray(seg16, dt),
    ]
    if k1mat is None:
        kernel = functools.partial(_post_t1_kernel, eps=eps)
    else:
        kernel = functools.partial(_from_src_kernel, eps=eps)
        specs.insert(1, pl.BlockSpec((m_in, m1), lambda t, p: (0, 0)))
        operands.insert(1, k1mat.astype(dt))

    if out_16pt:
        out_specs = pl.BlockSpec((pb, 16, pt), lambda t, p: (p, 0, t))
        out_shape = jax.ShapeDtypeStruct((b, 16, hw), dt)
    else:
        out_specs = pl.BlockSpec((pb, pt, 16), lambda t, p: (p, t, 0))
        out_shape = jax.ShapeDtypeStruct((b, hw, 16), dt)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")))),
    )(*operands)
    return out


def fused_post_t1_xla(t1, bias1_4, s1f, ln_w, ln_b, k2mat, bias2, s0f16,
                      hyper, *, eps=1e-6):
    """Pure-XLA same-contraction reference for fused_post_t1 (tests/CPU)."""
    b, hw, m1 = t1.shape
    c2 = k2mat.shape[1] // 4
    c1 = m1 // 4
    z = (t1.astype(jnp.float32) + bias1_4.astype(jnp.float32)
         + s1f.astype(jnp.float32)[None]).reshape(b, hw, 4, c1)
    mu = z.mean(-1, keepdims=True)
    var = jnp.square(z - mu).mean(-1, keepdims=True)
    zn = (z - mu) * jax.lax.rsqrt(var + eps)
    zn = zn * ln_w.astype(jnp.float32) + ln_b.astype(jnp.float32)
    u = jax.nn.gelu(zn, approximate=False).astype(t1.dtype)
    t2 = jnp.einsum("bhpc,cm->bhpm", u, k2mat.astype(u.dtype),
                    preferred_element_type=jnp.float32)     # [b, hw, 4, 4c2]
    z2 = (t2.reshape(b, hw, 16 * c2)
          + jnp.tile(bias2, 16).astype(jnp.float32)
          + s0f16.astype(jnp.float32)[None])
    g = jax.nn.gelu(z2, approximate=False)
    gh = g * jnp.tile(hyper, (1, 16)).astype(jnp.float32)[:, None, :]
    seg16 = np.repeat(np.arange(16), c2)
    seg16 = jnp.asarray(
        (seg16[:, None] == np.arange(16)[None]).astype(np.float32), t1.dtype)
    mask = jnp.einsum("bhm,mk->bhk", gh.astype(t1.dtype), seg16,
                      preferred_element_type=jnp.float32)
    return mask.astype(t1.dtype)
