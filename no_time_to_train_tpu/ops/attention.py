"""Scaled dot-product attention for TPU.

Single entry point used by every attention module in the framework (Hiera,
two-way decoder, memory attention, DINO). Replaces the reference's
torch SDPA / flash-attn selection (sam2/modeling/sam/transformer.py:23-41).

The XLA path below is fully fused by Mosaic/XLA for the shapes this framework
uses; a Pallas flash-attention kernel can be swapped in via `impl="pallas"`
for long-sequence cases (Hiera global blocks at 4096 tokens).
"""
import jax
import jax.numpy as jnp

__all__ = ["sdpa", "sdpa_bnhd", "set_default_impl", "get_default_impl"]

# Backend policy, selected like the reference's global SDPA kernel context
# (sam2/modeling/sam/transformer.py:23-41 enables/disables flash per process):
# "pallas" (default) or "xla". Under "pallas" the single-pass/online flash
# kernels take long-sequence unmasked attention (DINO layers, Hiera global
# blocks, decoder image-side); short token-side and masked attentions always
# stay on the fused XLA path. Default flipped to "pallas" in round 4 after
# the bnhd single-pass kernel measured 93-94 ms/img pipelined / 120-125
# fenced vs xla's 94 / 123-127 on the flagship step (at worst par pipelined,
# consistently better fenced; ARCHITECTURE.md round-4 measurements);
# off-TPU every path falls back to XLA. Set BEFORE the first trace of a
# model — it is baked into the jitted program, exactly like the torch
# context.
_DEFAULT_IMPL = "pallas"
_PALLAS_MIN_Q = 512  # below this, blocks don't tile / XLA fusion wins


def _default_device_is_cpu():
    from no_time_to_train_tpu.ops.upscale_product import default_device_is_cpu
    return default_device_is_cpu()


def set_default_impl(impl):
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas"), impl
    _DEFAULT_IMPL = impl


def get_default_impl():
    return _DEFAULT_IMPL


def _xla_sdpa(q, k, v, mask=None):
    # q,k,v: [..., heads, N, D] — same layout as torch SDPA
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    if mask is None and k.shape[-2] <= 32 and q.shape[-2] >= 4 * k.shape[-2]:
        # tiny key set (image->token cross-attention: Nk ~ 8 prompt tokens vs
        # Nq = 4096 image tokens): keep Nq on the lane axis and softmax over
        # the SUBLANE axis — an Nk-minor [.., Nq, 8] layout pads 8 lanes to
        # 128 (16x elementwise/reduce traffic, profiled). Same ops transposed.
        logits = jnp.einsum("...kd,...qd->...kq", k, q) * scale
        probs = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-2).astype(q.dtype)
        return jnp.einsum("...kq,...kd->...qd", probs, v)
    logits = jnp.einsum("...qd,...kd->...qk", q, k) * scale
    if mask is not None:
        big_neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        logits = jnp.where(mask, logits, big_neg)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


def sdpa_bnhd(q, k, v, impl=None):
    """Attention with [..., N, heads, D] operands AND result — the layout a
    packed qkv GEMM already produces. The [.., heads, N, D] form `sdpa` takes
    costs a real relayout copy when (heads, D) is not lane-aligned (Hiera's
    dh=72 profiled ~3.6 ms/step across blocks); expressing the head-batched
    contractions directly lets XLA fold the operand orders into the attention
    GEMMs instead. Same math as `sdpa` (f32 softmax, same cast points).

    Under the process-default "pallas" impl, long sequences take the
    single-pass flash kernel's native bnhd entry (flash_sdpa_bnhd — the head
    axis is a kernel grid dimension, so no relayout copies exist); key
    ranges beyond its VMEM cap fall back to the online kernel via explicit
    transposes, preserving the `attention_impl` flag's meaning."""
    if impl is None:
        impl = _DEFAULT_IMPL
    if impl == "pallas":
        from no_time_to_train_tpu.ops.upscale_product import fusion_disabled
        if (q.shape[-3] >= _PALLAS_MIN_Q and k.shape[-3] >= _PALLAS_MIN_Q
                and not _default_device_is_cpu() and not fusion_disabled()):
            from no_time_to_train_tpu.ops.flash_attention import \
                flash_sdpa_bnhd
            out = flash_sdpa_bnhd(q, k, v)
            if out is not None:
                return out
        out = sdpa(q.swapaxes(-3, -2), k.swapaxes(-3, -2),
                   v.swapaxes(-3, -2), impl=impl)
        return out.swapaxes(-3, -2)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


def window_sdpa_qkv(qkv, *, heads, win, impl=None, min_tokens=4096):
    """Batched window-local attention DIRECTLY on a packed qkv GEMM output
    [B, T, 3C] where every leading-dim row is its own attention domain
    (Hiera windowed blocks: B = image_batch * n_windows, T = window
    tokens). Flattens to one window-major token stream and runs the
    block-diagonal single-pass kernel (flash_attention.flash_sdpa_window_qkv)
    — no [B, T, 3, H, D] head-split relayout, no per-window XLA SDPA.
    Returns [B, T, C], or None when the pallas path doesn't apply (caller
    keeps the split + sdpa_bnhd fallback)."""
    if impl is None:
        impl = _DEFAULT_IMPL
    b, t, c3 = qkv.shape
    from no_time_to_train_tpu.ops.upscale_product import fusion_disabled
    if (impl != "pallas" or b * t < min_tokens or c3 % 3 or win != t
            or _default_device_is_cpu() or fusion_disabled()):
        return None
    import jax as _jax
    if _jax.default_backend() != "tpu":
        return None
    from no_time_to_train_tpu.ops.flash_attention import (
        flash_sdpa_window_qkv)
    out = flash_sdpa_window_qkv(qkv.reshape(1, b * t, c3), heads=heads,
                                win=win)
    return out.reshape(b, t, c3 // 3)


def sdpa(q, k, v, mask=None, impl=None):
    """Attention over [..., heads, N, D]. `mask` is broadcastable to
    [..., heads, Nq, Nk] with True = attend (torch bool attn_mask semantics).

    impl=None follows the process default (set_default_impl); "pallas"
    routes long unmasked sequences through the flash kernel and everything
    else through XLA."""
    if impl is None:
        impl = _DEFAULT_IMPL
    from no_time_to_train_tpu.ops.upscale_product import fusion_disabled
    if (impl == "pallas"
            and q.shape[-2] >= _PALLAS_MIN_Q and k.shape[-2] >= _PALLAS_MIN_Q
            and not _default_device_is_cpu() and not fusion_disabled()):
        if mask is None:
            from no_time_to_train_tpu.ops.flash_attention import flash_sdpa
            return flash_sdpa(q, k, v, mask=mask)
        from no_time_to_train_tpu.ops.flash_attention import (
            ONEPASS_MAX_NK, flash_sdpa_masked)
        if (q.ndim == 4 and mask.ndim == 4 and k.shape[-2] > ONEPASS_MAX_NK
                and mask.shape == (q.shape[0], 1, 1, k.shape[-2])
                and mask.dtype == jnp.bool_):
            # key-column validity mask over a key range too wide for the
            # resident kernels (memory attention's ring mask): the streaming
            # masked kernel keeps the f32 logits out of HBM. Shorter masked
            # key ranges stay on the fused XLA path (measured fine there).
            return flash_sdpa_masked(q, k, v, mask[:, 0, 0, :])
    return _xla_sdpa(q, k, v, mask)
