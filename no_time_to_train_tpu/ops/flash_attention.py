"""Pallas flash attention for TPU.

Two kernels behind one dispatch (`flash_sdpa`, [B, H, N, D] torch-SDPA
layout), used for the long-sequence hot spots: DINO's 1370-token layers,
Hiera's global-attention blocks (4096 tokens at 1024^2 input) and the
decoder's image-side attention.

- **Single-pass kernel** (key ranges up to ONEPASS_MAX_NK): the whole key
  range is resident in VMEM per grid step, so each query block does ONE
  QK GEMM, one plain softmax and one PV GEMM — no online-softmax carries,
  no per-block rescale traffic, and the head dim stays at its native size
  (64/72) instead of lane-padding to 128. The [block_q, n_k] f32 logits
  exist only in VMEM; under XLA the same logits round-trip HBM
  ([16, 1370, 1370] x 24 DINO layers is the encoder's bandwidth hot spot).
- **Online-softmax kernel** (wider key ranges): classic flash — keys/values
  stream block-by-block with running max/sum rescaling so only
  O(block^2) logits are ever materialized.

Falls back to the fused XLA path for shapes below the tiling minimum (the
decoder's token-side attentions have tiny N) or on non-TPU backends.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_TPU_PALLAS = False

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
# widest key range the single-pass kernel takes: the f32 logits block is
# capped at ~4MB by the block_q choice, and k/v for the whole range must
# also sit in VMEM (4608 x 128 x bf16 = 1.2MB each) alongside it
ONEPASS_MAX_NK = 4608
ONEPASS_LOGITS_BYTES = 4 * 1024 * 1024


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, sm_scale, n_valid):
    q = q_ref[0].astype(jnp.float32) * sm_scale  # [block_q, d]
    n_k = k_ref.shape[1]
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if n_valid < n_k:
            # keys beyond n_valid are padding: mask them out of the softmax
            # (n_valid is a trace-time constant; padded QUERY rows need no
            # handling — they see all-valid keys and are sliced off by the
            # caller). Gate on n_valid < n_k, not n_valid % block_k — a
            # caller may pad by whole blocks.
            col = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col < n_valid, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(p, v,
                                             preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    n_blocks = n_k // block_k
    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _softmax_attend(q, k, v, sm_scale, n_valid, out_dtype):
    """One full-key-range attention block: q [bq, d], k/v [n_k, d] (VMEM)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, n_k]
    if n_valid < k.shape[0]:
        # key axis padded to a lane multiple: mask padded columns out of the
        # softmax (padded QUERY rows need no handling — they see valid keys
        # and are sliced off by the caller)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    # softmax(c*s) = exp(c*(s - max s)) / sum: fold the scale into the
    # shifted exponent (c > 0 keeps the max argument valid)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp((s - m) * sm_scale)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    return jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, n_valid):
    o_ref[0] = _softmax_attend(q_ref[0], k_ref[0], v_ref[0], sm_scale,
                               n_valid, o_ref.dtype)


def _onepass_bnhd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads, sm_scale,
                         n_valid):
    # refs carry the [bq, H*D] / [n_k, H*D] token-major layout; heads are a
    # STATIC python loop over lane slices (a per-head grid/block dimension
    # is illegal — Pallas requires the last two block dims 8/128-divisible
    # or full — and a [B, H, N, D] relayout is exactly the copy this entry
    # exists to avoid)
    q_all, k_all, v_all = q_ref[0], k_ref[0], v_ref[0]
    d = q_all.shape[-1] // heads
    outs = []
    for i in range(heads):
        sl = slice(i * d, (i + 1) * d)
        outs.append(_softmax_attend(q_all[:, sl], k_all[:, sl], v_all[:, sl],
                                    sm_scale, n_valid, o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "n_valid", "interpret"))
def _onepass_bh(q, k, v, block_q, n_valid, interpret=False):
    """q: [BH, N_q, D] with N_q divisible by block_q; k, v: [BH, N_k, D] with
    the whole (padded) key range as one VMEM-resident block; n_valid <= N_k
    is the unpadded key count."""
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    sm_scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_onepass_kernel, sm_scale=sm_scale,
                               n_valid=n_valid)
    return pl.pallas_call(
        kernel,
        grid=(bh, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            # constant index across i: Mosaic keeps k/v resident instead of
            # re-DMAing them per query block
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "n_valid", "interpret"))
def _onepass_bnhd(q, k, v, block_q, n_valid, interpret=False):
    """Single-pass attention directly on the [B, N, H, D] qkv-GEMM layout —
    no [B, H, N, D] relayout copies anywhere. Heads fold into the lane axis
    ([B, N, H*D] blocks, the qkv GEMM's own output layout) and unfold as
    static lane slices inside the kernel."""
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    sm_scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_onepass_bnhd_kernel, heads=h,
                               sm_scale=sm_scale, n_valid=n_valid)
    out = pl.pallas_call(
        kernel,
        # k/v indices are constant across the (faster) query-block dim, so
        # Mosaic keeps the whole key range resident per batch instead of
        # re-DMAing it per query block
        grid=(b, n_q // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, h * d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, n_k, h * d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, n_k, h * d), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, h * d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_q, h * d), q.dtype),
        interpret=interpret,
    )(q.reshape(b, n_q, h * d), k.reshape(b, n_k, h * d),
      v.reshape(b, n_k, h * d))
    return out.reshape(b, n_q, h, d)


def flash_sdpa_bnhd(q, k, v):
    """Single-pass flash attention over [B, N, H, D] operands AND result
    (the layout a packed qkv GEMM produces — see attention.sdpa_bnhd).
    Returns None when the shape doesn't qualify (caller falls back)."""
    n_q, n_k = q.shape[-3], k.shape[-3]
    if not (_HAS_TPU_PALLAS and jax.default_backend() == "tpu"
            and q.ndim == 4 and n_q >= DEFAULT_BLOCK_Q
            and n_k >= DEFAULT_BLOCK_K):
        return None
    n_k_padded = (n_k + 127) // 128 * 128
    if n_k_padded > ONEPASS_MAX_NK:
        return None
    # halved logits budget: the bnhd layout also keeps ALL heads' k/v
    # resident in VMEM ([n_k, H*D] x2), so the logits block cedes room
    bq = _onepass_block_q(n_q, n_k_padded, ONEPASS_LOGITS_BYTES // 2)
    q_pad = (-n_q) % bq
    k_pad = n_k_padded - n_k
    if q_pad:
        q = jnp.pad(q, [(0, 0), (0, q_pad), (0, 0), (0, 0)])
    if k_pad:
        pad = [(0, 0), (0, k_pad), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    out = _onepass_bnhd(q, k, v, bq, n_k)
    return out[:, :n_q] if q_pad else out


def _onepass_block_q(n_q, n_k_padded, logits_bytes=ONEPASS_LOGITS_BYTES):
    """Largest 8-aligned query block keeping the f32 logits under the VMEM
    cap, shrunk to the evenest split of n_q so padding waste stays small."""
    target = max(8, min(512, logits_bytes // (4 * n_k_padded)))
    n_blocks = -(-n_q // target)           # ceil(n_q / target)
    per_block = -(-n_q // n_blocks)        # ceil(n_q / n_blocks)
    return (per_block + 7) // 8 * 8        # round up to the sublane grain


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "n_valid"))
def _flash_bh(q, k, v, block_q, block_k, n_valid):
    """q,k,v: [BH, N, D] with N divisible by the blocks; n_valid <= N_k is the
    unpadded key count (keys beyond it are masked from the softmax)."""
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    sm_scale = 1.0 / (d ** 0.5)
    grid = (bh, n_q // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               sm_scale=sm_scale, n_valid=n_valid)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
    )(q, k, v)


def flash_sdpa(q, k, v, mask=None, block_q=DEFAULT_BLOCK_Q,
               block_k=DEFAULT_BLOCK_K):
    """Attention over [..., H, N, D]. Uses the Pallas kernel when shapes tile
    cleanly and no mask is needed; otherwise the fused XLA path."""
    from no_time_to_train_tpu.ops.attention import _xla_sdpa
    n_q, d = q.shape[-2], q.shape[-1]
    n_k = k.shape[-2]
    usable = (_HAS_TPU_PALLAS and mask is None
              and jax.default_backend() == "tpu"
              and n_q >= block_q and n_k >= block_k)
    if not usable:
        return _xla_sdpa(q, k, v, mask)
    n_k_padded = (n_k + 127) // 128 * 128
    if n_k_padded <= ONEPASS_MAX_NK:
        # single-pass kernel: whole key range VMEM-resident, native head dim
        bq = _onepass_block_q(n_q, n_k_padded)
        q_pad = (-n_q) % bq
        k_pad = n_k_padded - n_k
        if q_pad:
            q = jnp.pad(q, [(0, 0)] * (q.ndim - 2) + [(0, q_pad), (0, 0)])
        if k_pad:
            pad = [(0, 0)] * (k.ndim - 2) + [(0, k_pad), (0, 0)]
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        lead = q.shape[:-2]
        out = _onepass_bh(q.reshape((-1,) + q.shape[-2:]),
                          k.reshape((-1,) + k.shape[-2:]),
                          v.reshape((-1,) + v.shape[-2:]), bq, n_k)
        out = out.reshape(lead + (n_q + q_pad, d))
        return out[..., :n_q, :] if q_pad else out
    # Ragged sequences tile via padding: queries pad to the q-block multiple
    # on a 128-sublane grain (padded rows compute garbage against the valid
    # keys — no NaN, all sliced off); keys/values pad to the k-block multiple
    # and the kernel masks the padded columns out of the softmax. This is
    # what lets DINO's 1370-token attention (24 layers x [16, 1370, 1370]
    # f32 logits under XLA, the encoder's HBM hot spot) run flash.
    bq = block_q if n_q % block_q == 0 else min(block_q, 128)
    bk = block_k if n_k % block_k == 0 else min(block_k, 128)
    q_pad = (-n_q) % bq
    k_pad = (-n_k) % bk
    # lane-pad head dim to 128 (Hiera uses 72, DINO 64): zero-padded K lanes
    # leave logits unchanged; zero-padded V lanes give zero outputs, sliced off.
    d_pad = (-d) % 128
    if d_pad:
        # kernel scales by 1/sqrt(d_padded); pre-scale q to compensate
        scale_fix = ((d + d_pad) ** 0.5) / (d ** 0.5)
        q = q * jnp.asarray(scale_fix, q.dtype)
    if d_pad or q_pad:
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 2) + [(0, q_pad), (0, d_pad)])
    if d_pad or k_pad:
        pad = [(0, 0)] * (k.ndim - 2) + [(0, k_pad), (0, d_pad)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    lead = q.shape[:-2]
    qf = q.reshape((-1,) + q.shape[-2:])
    kf = k.reshape((-1,) + k.shape[-2:])
    vf = v.reshape((-1,) + v.shape[-2:])
    out = _flash_bh(qf, kf, vf, bq, bk, n_k)
    out = out.reshape(lead + (n_q + q_pad, d + d_pad))
    return out[..., :n_q, :d] if (d_pad or q_pad) else out
