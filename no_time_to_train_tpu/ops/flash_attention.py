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
- **Streaming masked kernel** (`flash_sdpa_masked`): keys/values stream as
  k-grid blocks with the online carries in VMEM scratch, so neither the key
  range nor the head dim is bounded by VMEM residency, and an arbitrary
  per-batch key-column validity mask rides along as an additive f32 bias
  row. Built for SAM2 memory attention (4096 image queries x ~28.7k
  ring-masked memory keys x d=256, 4 layers per tracked frame — the
  validity pattern varies at runtime with the ring fill, reference
  concatenation semantics sam2_base.py:695-716).

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
# widest key range the ONLINE fallback kernel takes: _flash_bh also keeps
# the whole (padded) k/v resident in VMEM (2 x n_k x 128 lanes x bf16 =
# 512 B/key ~ 6.3 MB at this cap, of ~16 MB VMEM); beyond it the kernel
# fails to COMPILE (Mosaic VMEM allocation), so wider unmasked ranges must
# take the fused XLA path instead
RESIDENT_MAX_NK = 12288


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, sm_scale, n_valid):
    # GEMMs run in the operands' native dtype (bf16 on the hot path — f32
    # inputs would quarter the MXU rate) with f32 accumulation; the online
    # softmax carries stay f32 (same convention as _flash_masked_kernel)
    q = q_ref[0]  # [block_q, d]
    n_k = k_ref.shape[1]
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T,
                    preferred_element_type=jnp.float32) * sm_scale
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
        acc = acc * alpha[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
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


def _window_qkv_kernel(qkv_ref, o_ref, *, heads, dim, win, sm_scale):
    """Window-local attention DIRECTLY on the packed qkv GEMM output
    ([BQ, 3*H*D] token-major, BQ a multiple of the window size): per head,
    q/k/v are static lane slices, the [BQ, BQ] logits get an in-kernel
    block-diagonal window mask (token i attends token j iff
    i//win == j//win), one plain softmax, one PV GEMM. Queries, keys,
    values AND the result never leave the qkv layout — the [B, T, 3, H, D]
    head-split relayout copies this replaces were ~2.8 ms/step across the
    Hiera windowed blocks."""
    qkv = qkv_ref[0]
    c = heads * dim
    rows = jax.lax.broadcasted_iota(jnp.int32, (qkv.shape[0],) * 2, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qkv.shape[0],) * 2, 1)
    madd = jnp.where(rows // win == cols // win, 0.0, -1e30)
    outs = []
    for i in range(heads):
        q = qkv[:, i * dim:(i + 1) * dim]
        k = qkv[:, c + i * dim:c + (i + 1) * dim]
        v = qkv[:, 2 * c + i * dim:2 * c + (i + 1) * dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + madd
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - m) * sm_scale)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _window_block_q(win):
    """Largest multiple of `win` that is 8-sublane-divisible and <= ~512
    rows (the Hiera window sizes: 64 -> 512, 16 -> 512, 196 -> 392,
    49 -> 392)."""
    k = max(1, 512 // win)
    while k > 1 and (k * win) % 8:
        k -= 1
    bq = k * win
    while bq % 8:  # win itself not 8-divisible: grow the multiple
        bq += win
    return bq


@functools.partial(jax.jit, static_argnames=("heads", "win", "interpret"))
def flash_sdpa_window_qkv(qkv, *, heads, win, interpret=False):
    """Batched window-local self-attention on packed qkv.

    qkv: [B, N, 3C] with N = n_windows * win tokens in window-major order
    (C = heads * dim); every `win`-token group attends only within itself —
    exactly Hiera's windowed attention once the [Bw, T, C] window batch is
    flattened to [B=1, Bw*T, 3C] (and also exact for true image batches:
    each leading-dim row is its own attention domain). Returns [B, N, C].

    Replaces, for the windowed blocks, BOTH the XLA per-window SDPA and the
    qkv head-split relayout (hiera.py MultiScaleAttention). The window
    count is padded so N divides into whole query blocks; pad windows
    attend among themselves and are sliced off."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    dim = c // heads
    sm_scale = 1.0 / (dim ** 0.5)
    bq = _window_block_q(win)
    n_pad = (-n) % bq
    if n_pad:
        qkv = jnp.pad(qkv, [(0, 0), (0, n_pad), (0, 0)])
    kernel = functools.partial(_window_qkv_kernel, heads=heads, dim=dim,
                               win=win, sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid=(b, (n + n_pad) // bq),
        in_specs=[pl.BlockSpec((1, bq, c3), lambda b_, i: (b_, i, 0))],
        out_specs=pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n + n_pad, c), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out[:, :n] if n_pad else out


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


def _flash_masked_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                         acc_ref, m_ref, l_ref, *, sm_scale, n_kblocks):
    """Online-softmax step over one (query block, key block) grid cell.

    The k grid dimension is innermost (TPU grids iterate the last dimension
    fastest), so the (acc, m, l) scratch carries accumulate across the key
    blocks of one query block and the output writes once at the last one.
    bias_ref carries the key-column mask as an additive f32 row (0 valid,
    -1e30 masked): a fully-masked PREFIX self-heals (its acc/l are scaled by
    exp(-1e30 - m) = 0 at the first valid block), and a fully-masked ROW
    degrades to the uniform average of v — exactly the fused XLA path's
    where(mask, s, finfo.min) behavior."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    # GEMMs run in the operands' native dtype (bf16 on the hot path — f32
    # inputs would quarter the MXU rate) with f32 accumulation; the softmax
    # carries stay f32
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
    s = s * sm_scale + bias_ref[0]                  # [1, bk] broadcast
    m_prev = m_ref[...][:, :1]                      # [bq, 1]
    l_prev = l_ref[...][:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_kblocks - 1)
    def _fin():
        o_ref[0] = (acc_ref[...] / l_ref[...][:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "block_q", "block_k",
                                    "interpret"))
def _flash_masked_bh(q, k, v, bias, heads, block_q, block_k,
                     interpret=False):
    """q: [BH, N_q, D]; k, v: [BH, N_k, D]; bias: [B, 1, N_k] f32 additive
    key-column bias shared across the H heads of each batch element. N_q/N_k
    divisible by the blocks (caller pads; padded key columns carry -1e30
    bias, padded query rows are sliced off)."""
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    sm_scale = 1.0 / (d ** 0.5)
    n_kblocks = n_k // block_k
    kernel = functools.partial(_flash_masked_kernel, sm_scale=sm_scale,
                               n_kblocks=n_kblocks)
    return pl.pallas_call(
        kernel,
        grid=(bh, n_q // block_q, n_kblocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda b, i, j: (b // heads, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ] if _HAS_TPU_PALLAS else None,
        interpret=interpret,
    )(q, k, v, bias)


MASKED_NEG = -1e30


def flash_sdpa_masked(q, k, v, key_valid, block_q=1024, block_k=1024,
                      interpret=False):
    """Streaming flash attention with a per-batch key-column validity mask.

    q: [B, H, N_q, D]; k, v: [B, H, N_k, D]; key_valid: [B, N_k] bool
    (True = attend). Keys/values stream block-by-block through a k-grid
    dimension with the online-softmax carries in VMEM scratch, so N_k and D
    are unbounded by VMEM (memory attention's ~28.7k keys at d=256 don't
    fit the resident kernels). Rows with zero valid keys return the uniform
    average of v, matching the XLA masked path."""
    b, h, n_q, d = q.shape
    n_k = k.shape[-2]
    bq = min(block_q, max(8, n_q))
    # keep the f32 logits block within the scoped-vmem budget
    while bq * block_k * 4 > ONEPASS_LOGITS_BYTES and block_k > 128:
        block_k //= 2
    bk = min(block_k, max(128, n_k))
    q_pad = (-n_q) % bq
    k_pad = (-n_k) % bk
    bias = jnp.where(key_valid, 0.0, MASKED_NEG).astype(jnp.float32)
    bias = bias[:, None, :]                                # [B, 1, N_k]
    if q_pad:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, q_pad), (0, 0)])
    if k_pad:
        pad = [(0, 0), (0, 0), (0, k_pad), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(bias, [(0, 0), (0, 0), (0, k_pad)],
                       constant_values=MASKED_NEG)
    out = _flash_masked_bh(q.reshape(b * h, n_q + q_pad, d),
                           k.reshape(b * h, n_k + k_pad, d),
                           v.reshape(b * h, n_k + k_pad, d),
                           bias, h, bq, bk, interpret=interpret)
    out = out.reshape(b, h, n_q + q_pad, d)
    return out[:, :, :n_q] if q_pad else out


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
    if n_k_padded > RESIDENT_MAX_NK:
        return _xla_sdpa(q, k, v, mask)
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
