"""Pallas kernels for the two-way mask-decoder's image-side attention — the
grid decode's dominant HBM traffic (reference sam2/modeling/sam/transformer.py
TwoWayAttentionBlock; profiled ~78 ms/step dense on one v5e at P=1024
prompts, almost all of it streaming per-prompt [P, 4096, *] tensors).

`fused_i2t_norm` runs the image<-token cross-attention half-block

    x        = keys + key_pe
    qi       = x @ Wq + bq                  (per image token)
    attn     = softmax(qi . tok_k / sqrt(dh)) @ tok_v   (per head)
    keys_out = LayerNorm(keys + attn @ Wout + bout)     (norm4)

in ONE pass over the image tokens: keys are read once and written once;
q-projection, per-head attention, out-projection, residual and LayerNorm all
happen in VMEM. The token side (Nk <= 16 prompt tokens) rides along as two
tiny per-prompt block-diagonal matrices so every contraction is a lane-full
MXU op:

  * Kbd[p] = blockdiag_h(tok_k[p, :, h*dh:(h+1)*dh].T)   [I, H*Np]
  * Vbd[p] = blockdiag_h(tok_v[p, :, h*dh:(h+1)*dh])     [H*Np, I]
  * logits  S = qi @ Kbd + pad_bias  — all H heads in one [bq, H*Np] GEMM
  * per-head softmax via segment sums: l = exp(S - rowmax) @ seg, then the
    normalizer broadcast back with segT on the MXU (a constant shift per row
    is exact for softmax, so the row max over ALL heads stands in for the
    per-head max)
  * attn out = P @ Vbd — the (head, dh) output lanes land exactly in the
    h-major layout the out-projection consumes; no head split/merge
    transposes anywhere.

Requires internal_dim == H * dh == 128-multiple and H * 16 == internal_dim
(the SAM2 decoder: C=256, downsample 2 -> I=128, H=8, dh=16, Np=16).
"""
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


# tests flip this to run the kernels through the Pallas interpreter on CPU
_INTERPRET = False


def _i2t_kernel(keys_ref, peq_ref, kbd_ref, bias_ref, vbd_ref, wq_ref, bq_ref,
                wout_ref, bout_ref, nw_ref, nb_ref, seg_ref, segT_ref, o_ref,
                *, sm_scale, eps, elem_f32, pe_whole=False):
    keys = keys_ref[0]                                   # [bq, C]
    # key_pe enters pre-projected: (keys + pe) @ Wq == keys @ Wq + pe @ Wq,
    # and the [n, I] projection is 4x smaller than re-streaming [n, C] pe
    # for every prompt block
    if pe_whole:
        # pe is one VMEM-resident [1, n, I] block (its per-(p, b) restream
        # was ~256 MB/chunk of redundant DMA); slice this step's rows
        bq = keys_ref.shape[1]
        peq = peq_ref[0, pl.ds(pl.program_id(1) * bq, bq), :]
    else:
        peq = peq_ref[0]
    qi = jnp.dot(keys, wq_ref[...], preferred_element_type=jnp.float32)
    qi = ((qi + peq.astype(jnp.float32)
           + bq_ref[0].astype(jnp.float32)) * sm_scale).astype(keys.dtype)
    s = jnp.dot(qi, kbd_ref[0], preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)              # [bq, H*Np]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l8 = jnp.dot(e, seg_ref[...], preferred_element_type=jnp.float32)
    lb = jnp.dot(1.0 / l8, segT_ref[...], preferred_element_type=jnp.float32)
    p = (e * lb).astype(keys.dtype)
    attn = jnp.dot(p, vbd_ref[0], preferred_element_type=jnp.float32)
    y = jnp.dot(attn.astype(keys.dtype), wout_ref[...],
                preferred_element_type=jnp.float32)
    y = y + bout_ref[0].astype(jnp.float32)
    # residual + norm4, mirroring common._layer_norm: the residual rounds to
    # the compute dtype first, stats accumulate in fp32
    rl = keys + y.astype(keys.dtype)
    rf = rl.astype(jnp.float32)
    # (measured-and-rejected: LN stats as MXU segment dots — the extra
    # rf*rf pass + broadcast dots cost ~0.74 ms/pass MORE than the native
    # cross-lane reductions here, 3.01 vs 2.27 ms/pass e2e-profiled; the
    # trick wins in the upscale kernel but this kernel is not VPU-bound.)
    if elem_f32:
        # test/CPU path: exact _layer_norm two-pass op order
        mu = jnp.mean(rf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(rf - mu), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        z = (rf - mu) * inv * nw_ref[0] + nb_ref[0]
    else:
        # one-pass stats (E[x^2] - mu^2): both reductions read rf once
        # instead of the dependent two-pass form; within f32 noise of
        # jnp.var and below bf16 output rounding
        mu = jnp.mean(rf, axis=-1, keepdims=True)
        ex2 = jnp.mean(rf * rf, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
        z = (rl - mu.astype(keys.dtype)) * inv.astype(keys.dtype)
        z = z * nw_ref[0].astype(keys.dtype) + nb_ref[0].astype(keys.dtype)
    o_ref[0] = z.astype(o_ref.dtype)


def _i2t_p2_kernel(keys_ref, peq_ref, kbd_ref, bias_ref, vbd_ref, wq_ref,
                   bq_ref, wout_ref, bout_ref, nw_ref, nb_ref, seg_ref,
                   segT_ref, o_ref, *, sm_scale, eps, elem_f32,
                   pe_whole=False):
    """_i2t_kernel over a PROMPT PAIR per grid step (per-prompt keys): the
    two prompts have independent keys AND kbd/vbd — the same fully
    independent chain structure as the image-pair experiment (2.75 vs 3.15
    ms/img), so Mosaic can overlap prompt 0's VPU softmax/LN with prompt
    1's MXU GEMMs inside one invocation."""
    bq_n = keys_ref.shape[1]
    if pe_whole:
        peq = peq_ref[0, pl.ds(pl.program_id(1) * bq_n, bq_n), :]
    else:
        peq = peq_ref[0]
    for j in range(2):
        keys = keys_ref[j]                               # [bq, C]
        qi = jnp.dot(keys, wq_ref[...], preferred_element_type=jnp.float32)
        qi = ((qi + peq.astype(jnp.float32)
               + bq_ref[0].astype(jnp.float32)) * sm_scale).astype(keys.dtype)
        s = jnp.dot(qi, kbd_ref[j], preferred_element_type=jnp.float32)
        s = s + bias_ref[0].astype(jnp.float32)          # [bq, H*Np]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l8 = jnp.dot(e, seg_ref[...], preferred_element_type=jnp.float32)
        lb = jnp.dot(1.0 / l8, segT_ref[...],
                     preferred_element_type=jnp.float32)
        p = (e * lb).astype(keys.dtype)
        attn = jnp.dot(p, vbd_ref[j], preferred_element_type=jnp.float32)
        y = jnp.dot(attn.astype(keys.dtype), wout_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + bout_ref[0].astype(jnp.float32)
        rl = keys + y.astype(keys.dtype)
        rf = rl.astype(jnp.float32)
        if elem_f32:
            mu = jnp.mean(rf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(rf - mu), axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(var + eps)
            z = (rf - mu) * inv * nw_ref[0] + nb_ref[0]
        else:
            mu = jnp.mean(rf, axis=-1, keepdims=True)
            ex2 = jnp.mean(rf * rf, axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
            z = (rl - mu.astype(keys.dtype)) * inv.astype(keys.dtype)
            z = z * nw_ref[0].astype(keys.dtype) \
                + nb_ref[0].astype(keys.dtype)
        o_ref[j] = z.astype(o_ref.dtype)


def _i2t_pre_kernel(keys_ref, qi_ref, kbd_ref, bias_ref, vbd_ref, wout_ref,
                    bout_ref, nw_ref, nb_ref, seg_ref, segT_ref, o_ref,
                    *, eps, elem_f32):
    """_i2t_kernel with the q-projection PRE-computed (broadcast-keys layer
    0: qi is identical for every prompt, so the in-kernel projection would
    redo the same [n, C] @ [C, I] GEMM for all P prompts — ~137 GFLOP/chunk
    of redundant MXU at flagship shapes). keys still stream for the
    residual."""
    keys = keys_ref[0]                                   # [bq, C]
    qi = qi_ref[...]                                     # [bq, I] pre-scaled
    s = jnp.dot(qi, kbd_ref[0], preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)              # [bq, H*Np]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l8 = jnp.dot(e, seg_ref[...], preferred_element_type=jnp.float32)
    lb = jnp.dot(1.0 / l8, segT_ref[...], preferred_element_type=jnp.float32)
    p = (e * lb).astype(keys.dtype)
    attn = jnp.dot(p, vbd_ref[0], preferred_element_type=jnp.float32)
    y = jnp.dot(attn.astype(keys.dtype), wout_ref[...],
                preferred_element_type=jnp.float32)
    y = y + bout_ref[0].astype(jnp.float32)
    rl = keys + y.astype(keys.dtype)
    rf = rl.astype(jnp.float32)
    if elem_f32:
        mu = jnp.mean(rf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(rf - mu), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        z = (rf - mu) * inv * nw_ref[0] + nb_ref[0]
    else:
        mu = jnp.mean(rf, axis=-1, keepdims=True)
        ex2 = jnp.mean(rf * rf, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
        z = (rl - mu.astype(keys.dtype)) * inv.astype(keys.dtype)
        z = z * nw_ref[0].astype(keys.dtype) + nb_ref[0].astype(keys.dtype)
    o_ref[0] = z.astype(o_ref.dtype)


def _i2t_pre_p2_kernel(keys_ref, qi_ref, kbd_ref, bias_ref, vbd_ref,
                       wout_ref, bout_ref, nw_ref, nb_ref, seg_ref,
                       segT_ref, o_ref, *, eps, elem_f32):
    """_i2t_pre_kernel over a PROMPT PAIR per grid step (broadcast keys):
    the two prompts share keys/qi but have independent kbd/vbd, so their
    GEMM->softmax->GEMM->LN chains are data-independent and Mosaic's
    scheduler can overlap prompt 0's VPU legs with prompt 1's MXU legs —
    the same in-kernel interleave that won 28% on the image-pair
    experiment (tools/bench_pair_kernel.py), applied WITHIN one image."""
    keys = keys_ref[0]                                   # [bq, C] shared
    qi = qi_ref[...]                                     # [bq, I] shared
    for j in range(2):
        s = jnp.dot(qi, kbd_ref[j], preferred_element_type=jnp.float32)
        s = s + bias_ref[0].astype(jnp.float32)          # [bq, H*Np]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l8 = jnp.dot(e, seg_ref[...], preferred_element_type=jnp.float32)
        lb = jnp.dot(1.0 / l8, segT_ref[...],
                     preferred_element_type=jnp.float32)
        p = (e * lb).astype(keys.dtype)
        attn = jnp.dot(p, vbd_ref[j], preferred_element_type=jnp.float32)
        y = jnp.dot(attn.astype(keys.dtype), wout_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + bout_ref[0].astype(jnp.float32)
        rl = keys + y.astype(keys.dtype)
        rf = rl.astype(jnp.float32)
        if elem_f32:
            mu = jnp.mean(rf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(rf - mu), axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(var + eps)
            z = (rf - mu) * inv * nw_ref[0] + nb_ref[0]
        else:
            mu = jnp.mean(rf, axis=-1, keepdims=True)
            ex2 = jnp.mean(rf * rf, axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
            z = (rl - mu.astype(keys.dtype)) * inv.astype(keys.dtype)
            z = z * nw_ref[0].astype(keys.dtype) \
                + nb_ref[0].astype(keys.dtype)
        o_ref[j] = z.astype(o_ref.dtype)


# Prompt-pair interleave toggle for the broadcast i2t kernel.
# MEASURED-AND-REJECTED (round 5): 3.98 ms/pass vs 3.78 single at the
# flagship shapes — unlike the IMAGE pair (2.75/img vs 3.83, where both
# keys and prompt tensors differ per chain), sharing keys/qi does not let
# Mosaic interleave the chains; the doubled out/kbd/vbd blocks appear to
# eat the double-buffering headroom instead. Kept opt-in
# (NTTT_PROMPT_PAIR=1) with interpret parity so the experiment stays
# reproducible.
def _prompt_pair_enabled():
    import os
    return os.environ.get("NTTT_PROMPT_PAIR", "0") == "1"


def _perprompt_pair_enabled():
    """Pair toggle for the PER-PROMPT kernels (independent keys per chain —
    the structure the image-pair experiment proved Mosaic interleaves).
    MEASURED-AND-REJECTED e2e (round 5): the isolated i2t pass DOES win
    (3.67 vs 4.01 ms, bit-identical; t2i par 3.18 vs 3.21) but the full
    flagship step measured 93/93 ms/img against 91/91 without — the
    doubled keys/out blocks (4 MB/step extra VMEM working set) evidently
    crowd out neighboring-op overlap that the isolated loop doesn't see.
    Opt-in via NTTT_PERPROMPT_PAIR=1; interpret parity stays in the suite."""
    import os
    return os.environ.get("NTTT_PERPROMPT_PAIR", "0") == "1"


def fused_i2t_norm(keys, pe_q, tok_k, tok_v, wq, bq, wout, bout, norm_w,
                   norm_b, *, num_heads, eps=1e-5, pos_block=2048,
                   interpret=False):
    """keys: [Pk, n, C] (Pk == P, or 1 broadcast across prompts — layer 0);
    pe_q: [n, I] or [Pe, n, I] — the key positional encoding ALREADY pushed
    through the q-projection (pe @ Wq, no bias): (keys + pe) @ Wq
    decomposes, and the projected form is 4x smaller per streamed block;
    tok_k/tok_v: [P, T, I] token-side projections (T <= 16);
    wq: [C, I]; bq: [I]; wout: [I, C]; bout: [C]; norm_w/b: [C].
    Returns LayerNorm(keys + attn_out) [P, n, C] (keys dtype)."""
    interpret = interpret or _INTERPRET
    p_, t, i = tok_k.shape
    pk, n, c = keys.shape
    if pe_q.ndim == 2:
        pe_q = pe_q[None]
    pe_b = pe_q.shape[0]
    h = num_heads
    dh = i // h
    np_ = 16
    assert t <= np_ and h * np_ == i and wq.shape == (c, i), (tok_k.shape, i)
    dt = keys.dtype
    bq_pos = pos_block
    while n % bq_pos:
        bq_pos //= 2

    kp = tok_k.reshape(p_, t, h, dh)
    vp = tok_v.reshape(p_, t, h, dh)
    eye = jnp.eye(h, dtype=jnp.float32)
    # Kbd[(h, dh), (g, j)] = tok_k[j, (h, dh)] * (h == g), j padded to Np
    kbd = jnp.einsum("pjhd,hg->phdgj", kp.astype(jnp.float32), eye)
    kbd = jnp.pad(kbd, ((0, 0), (0, 0), (0, 0), (0, 0), (0, np_ - t)))
    kbd = kbd.reshape(p_, i, h * np_).astype(dt)
    # Vbd[(g, j), (h, dh)] = tok_v[j, (h, dh)] * (g == h)
    vbd = jnp.einsum("pjhd,hg->pgjhd", vp.astype(jnp.float32), eye)
    vbd = jnp.pad(vbd, ((0, 0), (0, 0), (0, np_ - t), (0, 0), (0, 0)))
    vbd = vbd.reshape(p_, h * np_, i).astype(dt)
    pad_bias = np.where(np.arange(np_) < t, 0.0, -1e30)[None, :]
    pad_bias = jnp.asarray(np.tile(pad_bias, (h, 1)).reshape(1, h * np_),
                           jnp.float32)
    segid = np.repeat(np.arange(h), np_)
    seg = jnp.asarray((segid[:, None] == np.arange(h)[None])
                      .astype(np.float32))                # [H*Np, H]
    segT = jnp.asarray((np.arange(h)[:, None] == segid[None])
                       .astype(np.float32))               # [H, H*Np]

    nb = n // bq_pos
    bcast = pk == 1 and pe_b == 1
    if bcast:
        # Broadcast keys (layer 0: every prompt attends the SAME image
        # features). Two de-duplications: (a) the q-projection is computed
        # ONCE in XLA (the in-kernel one would redo the same [n, C] @ [C, I]
        # GEMM per prompt, ~137 GFLOP/chunk); (b) with the prompt dim
        # innermost, the keys/qi blocks' index depends only on the OUTER
        # grid dim, so each is DMA'd once and stays VMEM-resident across
        # the whole prompt sweep (the (p, b) order re-fetched ~0.75
        # GB/chunk). Numerics identical: same bf16 dot, f32 adds/scale,
        # same cast points as the in-kernel projection.
        qi = (jnp.dot(keys[0].astype(dt), wq.astype(dt),
                      preferred_element_type=jnp.float32)
              + pe_q[0].astype(dt).astype(jnp.float32)
              + bq.astype(jnp.float32)) * (1.0 / (dh ** 0.5))
        qi = qi.astype(dt)
        if p_ % 2 == 0 and _prompt_pair_enabled():
            # prompt-pair body: two independent chains per grid step for
            # Mosaic to interleave (see _i2t_pre_p2_kernel)
            out = pl.pallas_call(
                functools.partial(_i2t_pre_p2_kernel, eps=eps,
                                  elem_f32=(dt == jnp.float32)),
                grid=(nb, p_ // 2),
                in_specs=[
                    pl.BlockSpec((1, bq_pos, c), lambda b, p: (0, b, 0)),
                    pl.BlockSpec((bq_pos, i), lambda b, p: (b, 0)),
                    pl.BlockSpec((2, i, h * np_), lambda b, p: (p, 0, 0)),
                    pl.BlockSpec((1, h * np_), lambda b, p: (0, 0)),
                    pl.BlockSpec((2, h * np_, i), lambda b, p: (p, 0, 0)),
                    pl.BlockSpec((i, c), lambda b, p: (0, 0)),
                    pl.BlockSpec((1, c), lambda b, p: (0, 0)),
                    pl.BlockSpec((1, c), lambda b, p: (0, 0)),
                    pl.BlockSpec((1, c), lambda b, p: (0, 0)),
                    pl.BlockSpec((h * np_, h), lambda b, p: (0, 0)),
                    pl.BlockSpec((h, h * np_), lambda b, p: (0, 0)),
                ],
                out_specs=pl.BlockSpec((2, bq_pos, c),
                                       lambda b, p: (p, b, 0)),
                out_shape=jax.ShapeDtypeStruct((p_, n, c), dt),
                interpret=interpret,
                **({} if interpret else dict(
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary", "arbitrary")))),
            )(keys.astype(dt), qi, kbd, pad_bias, vbd, wout.astype(dt),
              bout[None].astype(jnp.float32),
              norm_w[None].astype(jnp.float32),
              norm_b[None].astype(jnp.float32), seg, segT)
            return out
        out = pl.pallas_call(
            functools.partial(_i2t_pre_kernel, eps=eps,
                              elem_f32=(dt == jnp.float32)),
            grid=(nb, p_),
            in_specs=[
                pl.BlockSpec((1, bq_pos, c), lambda b, p: (0, b, 0)),
                pl.BlockSpec((bq_pos, i), lambda b, p: (b, 0)),
                pl.BlockSpec((1, i, h * np_), lambda b, p: (p, 0, 0)),
                pl.BlockSpec((1, h * np_), lambda b, p: (0, 0)),
                pl.BlockSpec((1, h * np_, i), lambda b, p: (p, 0, 0)),
                pl.BlockSpec((i, c), lambda b, p: (0, 0)),
                pl.BlockSpec((1, c), lambda b, p: (0, 0)),
                pl.BlockSpec((1, c), lambda b, p: (0, 0)),
                pl.BlockSpec((1, c), lambda b, p: (0, 0)),
                pl.BlockSpec((h * np_, h), lambda b, p: (0, 0)),
                pl.BlockSpec((h, h * np_), lambda b, p: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq_pos, c), lambda b, p: (p, b, 0)),
            out_shape=jax.ShapeDtypeStruct((p_, n, c), dt),
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary")))),
        )(keys.astype(dt), qi, kbd, pad_bias, vbd, wout.astype(dt),
          bout[None].astype(jnp.float32), norm_w[None].astype(jnp.float32),
          norm_b[None].astype(jnp.float32), seg, segT)
        return out

    # Per-prompt PAIR body (default ON, NTTT_PERPROMPT_PAIR=0 reverts):
    # unlike the rejected shared-keys prompt pair on the broadcast body,
    # per-prompt chains are FULLY independent (own keys + own kbd/vbd) —
    # the structure the image-pair experiment proved Mosaic interleaves.
    if pk == p_ and pe_b == 1 and p_ % 2 == 0 and _perprompt_pair_enabled():
        pe_whole = nb > 1
        if pe_whole:
            pe_spec = pl.BlockSpec((1, n, i), lambda p, b: (0, 0, 0))
        else:
            pe_spec = pl.BlockSpec((1, bq_pos, i), lambda p, b: (0, b, 0))
        out = pl.pallas_call(
            functools.partial(_i2t_p2_kernel, sm_scale=1.0 / (dh ** 0.5),
                              eps=eps, elem_f32=(dt == jnp.float32),
                              pe_whole=pe_whole),
            grid=(p_ // 2, nb),
            in_specs=[
                pl.BlockSpec((2, bq_pos, c), lambda p, b: (p, b, 0)),
                pe_spec,
                pl.BlockSpec((2, i, h * np_), lambda p, b: (p, 0, 0)),
                pl.BlockSpec((1, h * np_), lambda p, b: (0, 0)),
                pl.BlockSpec((2, h * np_, i), lambda p, b: (p, 0, 0)),
                pl.BlockSpec((c, i), lambda p, b: (0, 0)),
                pl.BlockSpec((1, i), lambda p, b: (0, 0)),
                pl.BlockSpec((i, c), lambda p, b: (0, 0)),
                pl.BlockSpec((1, c), lambda p, b: (0, 0)),
                pl.BlockSpec((1, c), lambda p, b: (0, 0)),
                pl.BlockSpec((1, c), lambda p, b: (0, 0)),
                pl.BlockSpec((h * np_, h), lambda p, b: (0, 0)),
                pl.BlockSpec((h, h * np_), lambda p, b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((2, bq_pos, c), lambda p, b: (p, b, 0)),
            out_shape=jax.ShapeDtypeStruct((p_, n, c), dt),
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")))),
        )(keys.astype(dt), pe_q.astype(dt), kbd, pad_bias, vbd,
          wq.astype(dt), bq[None].astype(jnp.float32), wout.astype(dt),
          bout[None].astype(jnp.float32), norm_w[None].astype(jnp.float32),
          norm_b[None].astype(jnp.float32), seg, segT)
        return out

    grid = (p_, nb)
    k_idx = (lambda p, b: (0, b, 0)) if pk == 1 else (lambda p, b: (p, b, 0))
    # per-prompt keys + shared pe: hold the WHOLE [1, n, I] pe resident in
    # VMEM (constant index) and slice rows in-kernel — the (0, b, 0) block
    # stream re-fetched the same pe for every prompt
    pe_whole = (not bcast) and pe_b == 1 and nb > 1
    if pe_whole:
        pe_spec = pl.BlockSpec((1, n, i), lambda p, b: (0, 0, 0))
    else:
        pe_spec = pl.BlockSpec((1, bq_pos, i),
                               (lambda p, b: (0, b, 0)) if pe_b == 1
                               else (lambda p, b: (p, b, 0)))
    out = pl.pallas_call(
        functools.partial(_i2t_kernel, sm_scale=1.0 / (dh ** 0.5), eps=eps,
                          elem_f32=(dt == jnp.float32), pe_whole=pe_whole),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq_pos, c), k_idx),
            pe_spec,
            pl.BlockSpec((1, i, h * np_), lambda p, b: (p, 0, 0)),
            pl.BlockSpec((1, h * np_), lambda p, b: (0, 0)),
            pl.BlockSpec((1, h * np_, i), lambda p, b: (p, 0, 0)),
            pl.BlockSpec((c, i), lambda p, b: (0, 0)),
            pl.BlockSpec((1, i), lambda p, b: (0, 0)),
            pl.BlockSpec((i, c), lambda p, b: (0, 0)),
            pl.BlockSpec((1, c), lambda p, b: (0, 0)),
            pl.BlockSpec((1, c), lambda p, b: (0, 0)),
            pl.BlockSpec((1, c), lambda p, b: (0, 0)),
            pl.BlockSpec((h * np_, h), lambda p, b: (0, 0)),
            pl.BlockSpec((h, h * np_), lambda p, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq_pos, c), lambda p, b: (p, b, 0)),
        out_shape=jax.ShapeDtypeStruct((p_, n, c), dt),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")))),
    )(keys.astype(dt), pe_q.astype(dt), kbd, pad_bias, vbd,
      wq.astype(dt), bq[None].astype(jnp.float32), wout.astype(dt),
      bout[None].astype(jnp.float32), norm_w[None].astype(jnp.float32),
      norm_b[None].astype(jnp.float32), seg, segT)
    return out


def _i2t_pre_pair_kernel(keys_ref, qi_ref, kbd_ref, bias_ref, vbd_ref,
                         wout_ref, bout_ref, nw_ref, nb_ref, seg_ref,
                         segT_ref, o_ref, *, eps, elem_f32):
    """_i2t_pre_kernel over an image PAIR per grid step (batching experiment,
    VERDICT r4 #1): the two sub-problems are data-independent, so Mosaic's
    scheduler is free to overlap image 0's VPU softmax/LN with image 1's MXU
    GEMMs inside one kernel invocation — cross-image overlap that separate
    grid steps (the vmap form) cannot express, since Mosaic pipelines only
    DMA across steps, not compute."""
    for j in range(2):
        keys = keys_ref[j]                                # [bq, C]
        qi = qi_ref[j]                                    # [bq, I] pre-scaled
        s = jnp.dot(qi, kbd_ref[j, 0],
                    preferred_element_type=jnp.float32)
        s = s + bias_ref[0].astype(jnp.float32)           # [bq, H*Np]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l8 = jnp.dot(e, seg_ref[...], preferred_element_type=jnp.float32)
        lb = jnp.dot(1.0 / l8, segT_ref[...],
                     preferred_element_type=jnp.float32)
        p = (e * lb).astype(keys.dtype)
        attn = jnp.dot(p, vbd_ref[j, 0],
                       preferred_element_type=jnp.float32)
        y = jnp.dot(attn.astype(keys.dtype), wout_ref[...],
                    preferred_element_type=jnp.float32)
        y = y + bout_ref[0].astype(jnp.float32)
        rl = keys + y.astype(keys.dtype)
        rf = rl.astype(jnp.float32)
        if elem_f32:
            mu = jnp.mean(rf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(rf - mu), axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(var + eps)
            z = (rf - mu) * inv * nw_ref[0] + nb_ref[0]
        else:
            mu = jnp.mean(rf, axis=-1, keepdims=True)
            ex2 = jnp.mean(rf * rf, axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
            z = (rl - mu.astype(keys.dtype)) * inv.astype(keys.dtype)
            z = z * nw_ref[0].astype(keys.dtype) \
                + nb_ref[0].astype(keys.dtype)
        o_ref[j, 0] = z.astype(o_ref.dtype)


def fused_i2t_norm_pair(keys2, pe_q2, tok_k2, tok_v2, wq, bq, wout, bout,
                        norm_w, norm_b, *, num_heads, eps=1e-5,
                        pos_block=2048, interpret=False):
    """Broadcast-keys i2t for an image PAIR with the pair INSIDE the kernel
    body (see _i2t_pre_pair_kernel). keys2: [2, n, C]; pe_q2: [2, n, I]
    (pre-projected); tok_k2/tok_v2: [2, P, T, I]. Returns [2, P, n, C].
    Numerics identical to vmap(fused_i2t_norm) over the leading axis."""
    interpret = interpret or _INTERPRET
    two, p_, t, i = tok_k2.shape
    _, n, c = keys2.shape
    assert two == 2 and keys2.shape[0] == 2 and pe_q2.shape[0] == 2
    h = num_heads
    dh = i // h
    np_ = 16
    assert t <= np_ and h * np_ == i and wq.shape == (c, i)
    dt = keys2.dtype
    bq_pos = pos_block
    while n % bq_pos:
        bq_pos //= 2

    kp = tok_k2.reshape(2, p_, t, h, dh)
    vp = tok_v2.reshape(2, p_, t, h, dh)
    eye = jnp.eye(h, dtype=jnp.float32)
    kbd = jnp.einsum("xpjhd,hg->xphdgj", kp.astype(jnp.float32), eye)
    kbd = jnp.pad(kbd, ((0, 0),) * 5 + ((0, np_ - t),))
    kbd = kbd.reshape(2, p_, i, h * np_).astype(dt)
    vbd = jnp.einsum("xpjhd,hg->xpgjhd", vp.astype(jnp.float32), eye)
    vbd = jnp.pad(vbd, ((0, 0), (0, 0), (0, 0), (0, np_ - t), (0, 0),
                        (0, 0)))
    vbd = vbd.reshape(2, p_, h * np_, i).astype(dt)
    pad_bias = np.where(np.arange(np_) < t, 0.0, -1e30)[None, :]
    pad_bias = jnp.asarray(np.tile(pad_bias, (h, 1)).reshape(1, h * np_),
                           jnp.float32)
    segid = np.repeat(np.arange(h), np_)
    seg = jnp.asarray((segid[:, None] == np.arange(h)[None])
                      .astype(np.float32))
    segT = jnp.asarray((np.arange(h)[:, None] == segid[None])
                       .astype(np.float32))

    nb = n // bq_pos
    qi = (jnp.einsum("xnc,ci->xni", keys2.astype(dt), wq.astype(dt),
                     preferred_element_type=jnp.float32)
          + pe_q2.astype(dt).astype(jnp.float32)
          + bq.astype(jnp.float32)) * (1.0 / (dh ** 0.5))
    qi = qi.astype(dt)
    out = pl.pallas_call(
        functools.partial(_i2t_pre_pair_kernel, eps=eps,
                          elem_f32=(dt == jnp.float32)),
        grid=(nb, p_),
        in_specs=[
            pl.BlockSpec((2, bq_pos, c), lambda b, p: (0, b, 0)),
            pl.BlockSpec((2, bq_pos, i), lambda b, p: (0, b, 0)),
            pl.BlockSpec((2, 1, i, h * np_), lambda b, p: (0, p, 0, 0)),
            pl.BlockSpec((1, h * np_), lambda b, p: (0, 0)),
            pl.BlockSpec((2, 1, h * np_, i), lambda b, p: (0, p, 0, 0)),
            pl.BlockSpec((i, c), lambda b, p: (0, 0)),
            pl.BlockSpec((1, c), lambda b, p: (0, 0)),
            pl.BlockSpec((1, c), lambda b, p: (0, 0)),
            pl.BlockSpec((1, c), lambda b, p: (0, 0)),
            pl.BlockSpec((h * np_, h), lambda b, p: (0, 0)),
            pl.BlockSpec((h, h * np_), lambda b, p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((2, 1, bq_pos, c), lambda b, p: (0, p, b, 0)),
        out_shape=jax.ShapeDtypeStruct((2, p_, n, c), dt),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")))),
    )(keys2.astype(dt), qi, kbd, pad_bias, vbd, wout.astype(dt),
      bout[None].astype(jnp.float32), norm_w[None].astype(jnp.float32),
      norm_b[None].astype(jnp.float32), seg, segT)
    return out


def fused_i2t_norm_xla(keys, pe_q, tok_k, tok_v, wq, bq, wout, bout,
                       norm_w, norm_b, *, num_heads, eps=1e-5):
    """Pure-XLA reference for fused_i2t_norm (tests/CPU fallback) — the exact
    unfused formulation: q-projection, per-head SDPA, out-projection,
    residual, LayerNorm."""
    from no_time_to_train_tpu.models.sam2.common import _layer_norm
    from no_time_to_train_tpu.ops.attention import _xla_sdpa
    p_, t, i = tok_k.shape
    pk, n, c = keys.shape
    h = num_heads
    dh = i // h
    peq = pe_q if pe_q.ndim == 3 else pe_q[None]
    qi = (keys.reshape(pk * n, c) @ wq.astype(keys.dtype)).reshape(pk, n, i) \
        + peq.astype(keys.dtype) + bq.astype(keys.dtype)
    qi = jnp.broadcast_to(qi, (max(p_, peq.shape[0]), n, i))

    def split(z):
        b, m, _ = z.shape
        return z.reshape(b, m, h, dh).transpose(0, 2, 1, 3)

    o = _xla_sdpa(split(qi), split(tok_k), split(tok_v))
    o = o.transpose(0, 2, 1, 3).reshape(p_, n, i)
    y = (o.reshape(p_ * n, i) @ wout.astype(o.dtype)).reshape(p_, n, c) \
        + bout.astype(o.dtype)
    r = keys + y
    return _layer_norm(r, norm_w, norm_b, eps, keys.dtype)


def _t2i_kernel(keys_ref, pek_ref, qbd_ref, bias_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, o_ref, m_ref, l_ref, acc_ref, *, n_blocks):
    """Token->image attention with the k projection in-kernel and online
    softmax over the streamed image blocks.

    Per (prompt, k-block) step: kk = (keys + pe) @ Wk and vv = keys @ Wv +
    bv project in-kernel; the per-head logits for ALL (head, token) pairs
    land in one lane-full GEMM S_T = kk @ Qbd [bk, H*Tp]; running max/sum
    per (head, token) lane; the weighted values accumulate as e^T @ vv
    (see the measured-and-rejected note below on the accumulate-then-
    project alternative). The h' mismatch blocks are discarded by the
    caller."""
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    keys = keys_ref[0]                                    # [bk, C]
    # key_pe enters pre-projected through Wk (see fused_i2t_norm)
    kk = jnp.dot(keys, wk_ref[...], preferred_element_type=jnp.float32)
    kk = (kk + pek_ref[0].astype(jnp.float32)
          + bk_ref[0].astype(jnp.float32)).astype(keys.dtype)
    vv = jnp.dot(keys, wv_ref[...], preferred_element_type=jnp.float32)
    vv = (vv + bv_ref[0].astype(jnp.float32)).astype(keys.dtype)

    s = jnp.dot(kk, qbd_ref[0], preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)               # [bk, H*Tp]
    m_cur = jnp.max(s, axis=0, keepdims=True)             # [1, H*Tp]
    m_new = jnp.maximum(m_ref[...], m_cur)
    alpha = jnp.exp(m_ref[...] - m_new)                   # [1, H*Tp]
    e = jnp.exp(s - m_new)                                # [bk, H*Tp]
    l_ref[...] = l_ref[...] * alpha + jnp.sum(e, axis=0, keepdims=True)
    # acc[(h, t), (h', dh)] += e.T @ vv  (contraction over block rows).
    # (measured-and-rejected: accumulating e^T @ keys and projecting through
    # Wv once at finish — the [bk, H*Tp]^T @ [bk, C] accumulation at N=256
    # lanes cost MORE than the saved keys @ Wv projection, 1.76 vs 1.455
    # ms/pass e2e-profiled.)
    upd = jax.lax.dot_general(e.astype(keys.dtype), vv,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[0][:, None] + upd
    m_ref[...] = m_new

    @pl.when(bi == n_blocks - 1)
    def _finish():
        linv = (1.0 / l_ref[...])[0][:, None]             # [H*Tp, 1]
        o_ref[0] = (acc_ref[...] * linv).astype(o_ref.dtype)


def _t2i_p2_kernel(keys_ref, pek_ref, qbd_ref, bias_ref, wk_ref, bk_ref,
                   wv_ref, bv_ref, o_ref, m_ref, l_ref, acc_ref, *,
                   n_blocks, h_tp):
    """_t2i_kernel over a PROMPT PAIR per grid step (independent keys and
    qbd per chain — the image-pair interleave structure). Scratch carries
    rows [2*H*Tp]; static pl.ds slices address each prompt's half."""
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pe = pek_ref[0].astype(jnp.float32)                  # shared [bk, I]
    for j in range(2):
        keys = keys_ref[j]                               # [bk, C]
        kk = jnp.dot(keys, wk_ref[...], preferred_element_type=jnp.float32)
        kk = (kk + pe + bk_ref[0].astype(jnp.float32)).astype(keys.dtype)
        vv = jnp.dot(keys, wv_ref[...], preferred_element_type=jnp.float32)
        vv = (vv + bv_ref[0].astype(jnp.float32)).astype(keys.dtype)
        s = jnp.dot(kk, qbd_ref[j], preferred_element_type=jnp.float32)
        s = s + bias_ref[0].astype(jnp.float32)          # [bk, H*Tp]
        m_j = m_ref[pl.ds(j, 1)]                         # [1, H*Tp]
        l_j = l_ref[pl.ds(j, 1)]
        acc_j = acc_ref[pl.ds(j * h_tp, h_tp)]           # [H*Tp, I]
        m_cur = jnp.max(s, axis=0, keepdims=True)
        m_new = jnp.maximum(m_j, m_cur)
        alpha = jnp.exp(m_j - m_new)
        e = jnp.exp(s - m_new)
        l_ref[pl.ds(j, 1)] = l_j * alpha \
            + jnp.sum(e, axis=0, keepdims=True)
        upd = jax.lax.dot_general(e.astype(keys.dtype), vv,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc_ref[pl.ds(j * h_tp, h_tp)] = acc_j * alpha[0][:, None] + upd
        m_ref[pl.ds(j, 1)] = m_new

    @pl.when(bi == n_blocks - 1)
    def _finish():
        for j in range(2):
            linv = (1.0 / l_ref[pl.ds(j, 1)])[0][:, None]
            o_ref[j] = (acc_ref[pl.ds(j * h_tp, h_tp)]
                        * linv).astype(o_ref.dtype)


def _t2i_pre_kernel(kk_ref, vv_ref, qbd_ref, bias_ref, o_ref, m_ref, l_ref,
                    acc_ref, *, n_blocks):
    """_t2i_kernel with the k/v projections PRE-computed (broadcast-keys
    layer 0: kk/vv are identical for every prompt, so the in-kernel
    per-prompt reprojection would redo the same [n, C] @ [C, I] GEMMs
    256x per chunk — ~137 GFLOP of redundant MXU work)."""
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kk = kk_ref[...]
    vv = vv_ref[...]
    s = jnp.dot(kk, qbd_ref[0], preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)
    m_cur = jnp.max(s, axis=0, keepdims=True)
    m_new = jnp.maximum(m_ref[...], m_cur)
    alpha = jnp.exp(m_ref[...] - m_new)
    e = jnp.exp(s - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(e, axis=0, keepdims=True)
    upd = jax.lax.dot_general(e.astype(kk.dtype), vv,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[0][:, None] + upd
    m_ref[...] = m_new

    @pl.when(bi == n_blocks - 1)
    def _finish():
        linv = (1.0 / l_ref[...])[0][:, None]
        o_ref[0] = (acc_ref[...] * linv).astype(o_ref.dtype)


def fused_t2i_attn(keys, pe_k, tok_q, wk, bk, wv, bv, *, num_heads,
                   pos_block=4096, interpret=False):
    """Token->image cross-attention core with in-kernel k/v projections.

    keys: [Pk, n, C] (Pk == P or 1); pe_k: [n, I] / [Pe, n, I] — key
    positional encoding pre-projected through Wk (pe @ Wk, no bias);
    tok_q: [P, T, I] token-side q-projection output, PRE-scaled is not
    required (1/sqrt(dh) applied here); wk/wv: [C, I]; bk/bv: [I].
    Returns attn out [P, T, I] (keys dtype) — feed to out_proj.

    Equivalent to sdpa(split(tok_q), split((keys+pe) @ Wk), split(keys @ Wv))
    merged back to [P, T, I]; replaces the two [P, n, I] projection
    materializations + [P, H, T, n] logits round-trips with one streamed
    pass over keys."""
    interpret = interpret or _INTERPRET
    p_, t, i = tok_q.shape
    pk, n, c = keys.shape
    if pe_k.ndim == 2:
        pe_k = pe_k[None]
    pe_b = pe_k.shape[0]
    h = num_heads
    dh = i // h
    tp = 16
    assert t <= tp and h * tp == i and wk.shape == (c, i)
    dt = keys.dtype
    bk_pos = pos_block
    while n % bk_pos:
        bk_pos //= 2
    n_blocks = n // bk_pos

    sm_scale = 1.0 / (dh ** 0.5)
    qp = (tok_q.astype(jnp.float32) * sm_scale).reshape(p_, t, h, dh)
    eye = jnp.eye(h, dtype=jnp.float32)
    # Qbd[(h, dh), (g, t)] = q[t, (h, dh)] * (h == g), t padded to Tp
    qbd = jnp.einsum("pthd,hg->phdgt", qp, eye)
    qbd = jnp.pad(qbd, ((0, 0), (0, 0), (0, 0), (0, 0), (0, tp - t)))
    qbd = qbd.reshape(p_, i, h * tp).astype(dt)
    pad_bias = np.where(np.arange(tp) < t, 0.0, -1e30)[None, :]
    pad_bias = jnp.asarray(np.tile(pad_bias, (h, 1)).reshape(1, h * tp),
                           jnp.float32)

    if pk == 1 and pe_b == 1:
        # Broadcast keys (layer 0): kk/vv are prompt-independent — project
        # ONCE in XLA (two [n, C] @ [C, I] GEMMs) instead of re-projecting
        # inside the kernel for all P prompts (~137 GFLOP/chunk redundant
        # MXU at flagship shapes). Numerics identical: same bf16 dot with
        # f32 accumulation, pe rounded through the compute dtype first.
        kk = (jnp.dot(keys[0].astype(dt), wk.astype(dt),
                      preferred_element_type=jnp.float32)
              + pe_k[0].astype(dt).astype(jnp.float32)
              + bk.astype(jnp.float32)).astype(dt)
        vv = (jnp.dot(keys[0].astype(dt), wv.astype(dt),
                      preferred_element_type=jnp.float32)
              + bv.astype(jnp.float32)).astype(dt)
        out = pl.pallas_call(
            functools.partial(_t2i_pre_kernel, n_blocks=n_blocks),
            grid=(p_, n_blocks),
            in_specs=[
                pl.BlockSpec((bk_pos, i), lambda p, b: (b, 0)),
                pl.BlockSpec((bk_pos, i), lambda p, b: (b, 0)),
                pl.BlockSpec((1, i, h * tp), lambda p, b: (p, 0, 0)),
                pl.BlockSpec((1, h * tp), lambda p, b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h * tp, i), lambda p, b: (p, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((p_, h * tp, i), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((1, h * tp), jnp.float32),
                pltpu.VMEM((1, h * tp), jnp.float32),
                pltpu.VMEM((h * tp, i), jnp.float32),
            ],
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")))),
        )(kk, vv, qbd, pad_bias)
        o4 = out.reshape(p_, h, tp, h, dh)
        o4 = o4[:, jnp.arange(h), :, jnp.arange(h), :]
        return (o4.transpose(1, 2, 0, 3)[:, :t]
                .reshape(p_, t, i).astype(dt))

    if pk == p_ and pe_b == 1 and p_ % 2 == 0 and _perprompt_pair_enabled():
        # prompt-pair body: two independent online-softmax chains per grid
        # step (own keys + own qbd) — see _t2i_p2_kernel
        out = pl.pallas_call(
            functools.partial(_t2i_p2_kernel, n_blocks=n_blocks,
                              h_tp=h * tp),
            grid=(p_ // 2, n_blocks),
            in_specs=[
                pl.BlockSpec((2, bk_pos, c), lambda p, b: (p, b, 0)),
                pl.BlockSpec((1, bk_pos, i), lambda p, b: (0, b, 0)),
                pl.BlockSpec((2, i, h * tp), lambda p, b: (p, 0, 0)),
                pl.BlockSpec((1, h * tp), lambda p, b: (0, 0)),
                pl.BlockSpec((c, i), lambda p, b: (0, 0)),
                pl.BlockSpec((1, i), lambda p, b: (0, 0)),
                pl.BlockSpec((c, i), lambda p, b: (0, 0)),
                pl.BlockSpec((1, i), lambda p, b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((2, h * tp, i), lambda p, b: (p, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((p_, h * tp, i), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, h * tp), jnp.float32),
                pltpu.VMEM((2, h * tp), jnp.float32),
                pltpu.VMEM((2 * h * tp, i), jnp.float32),
            ],
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")))),
        )(keys.astype(dt), pe_k.astype(dt), qbd, pad_bias,
          wk.astype(dt), bk[None].astype(jnp.float32),
          wv.astype(dt), bv[None].astype(jnp.float32))
        o4 = out.reshape(p_, h, tp, h, dh)
        o4 = o4[:, jnp.arange(h), :, jnp.arange(h), :]
        return (o4.transpose(1, 2, 0, 3)[:, :t]
                .reshape(p_, t, i).astype(dt))

    grid = (p_, n_blocks)
    k_idx = (lambda p, b: (0, b, 0)) if pk == 1 else (lambda p, b: (p, b, 0))
    pe_idx = (lambda p, b: (0, b, 0)) if pe_b == 1 \
        else (lambda p, b: (p, b, 0))
    out = pl.pallas_call(
        functools.partial(_t2i_kernel, n_blocks=n_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk_pos, c), k_idx),
            pl.BlockSpec((1, bk_pos, i), pe_idx),
            pl.BlockSpec((1, i, h * tp), lambda p, b: (p, 0, 0)),
            pl.BlockSpec((1, h * tp), lambda p, b: (0, 0)),
            pl.BlockSpec((c, i), lambda p, b: (0, 0)),
            pl.BlockSpec((1, i), lambda p, b: (0, 0)),
            pl.BlockSpec((c, i), lambda p, b: (0, 0)),
            pl.BlockSpec((1, i), lambda p, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h * tp, i), lambda p, b: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p_, h * tp, i), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, h * tp), jnp.float32),
            pltpu.VMEM((1, h * tp), jnp.float32),
            pltpu.VMEM((h * tp, i), jnp.float32),
        ],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")))),
    )(keys.astype(dt), pe_k.astype(dt), qbd, pad_bias,
      wk.astype(dt), bk[None].astype(jnp.float32),
      wv.astype(dt), bv[None].astype(jnp.float32))

    # rows (h, t), cols (h', dh): keep the h == h' diagonal blocks
    o4 = out.reshape(p_, h, tp, h, dh)
    o4 = o4[:, jnp.arange(h), :, jnp.arange(h), :]        # -> [h, P, tp, dh]
    return (o4.transpose(1, 2, 0, 3)[:, :t]
            .reshape(p_, t, i).astype(dt))


def fused_t2i_attn_xla(keys, pe_k, tok_q, wk, bk, wv, bv, *, num_heads):
    """Pure-XLA reference for fused_t2i_attn (tests/CPU fallback)."""
    from no_time_to_train_tpu.ops.attention import _xla_sdpa
    p_, t, i = tok_q.shape
    pk, n, c = keys.shape
    h = num_heads
    dh = i // h
    pek = pe_k if pe_k.ndim == 3 else pe_k[None]
    kk = (keys.reshape(-1, c) @ wk.astype(keys.dtype)).reshape(pk, n, i) \
        + pek.astype(keys.dtype) + bk.astype(keys.dtype)
    vv = (keys.reshape(-1, c) @ wv.astype(keys.dtype)).reshape(pk, n, i) \
        + bv.astype(keys.dtype)
    kk = jnp.broadcast_to(kk, (p_, n, i))
    vv = jnp.broadcast_to(vv, (p_, n, i))

    def split(z):
        b, m, _ = z.shape
        return z.reshape(b, m, h, dh).transpose(0, 2, 1, 3)

    o = _xla_sdpa(split(tok_q), split(kk), split(vv))
    return o.transpose(0, 2, 1, 3).reshape(p_, t, i)
