"""Pallas flash attention for TPU.

Online-softmax tiled attention over [B, H, N, D] (torch-SDPA layout), used for
the long-sequence hot spots: Hiera's three global-attention blocks (4096
tokens at 1024^2 input) and the decoder's image-side attention. Grid tiles
queries; keys/values stream block-by-block with running max/sum rescaling so
only O(block^2) logits are ever materialized in VMEM.

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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, sm_scale, n_valid):
    q = q_ref[0].astype(jnp.float32) * sm_scale  # [block_q, d]
    n_k = k_ref.shape[1]
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if n_valid % block_k:
            # key axis padded to the block multiple: mask the padded columns
            # out of the softmax (n_valid is a trace-time constant; padded
            # QUERY rows need no handling — they see all-valid keys and are
            # sliced off by the caller)
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
