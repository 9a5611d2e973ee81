"""Opt-in W8A8 int8 GEMMs for the encoder towers.

The v5e MXU runs int8 x int8 -> int32 matmuls at twice the bf16 rate, and
the encoder GEMMs (DINO + Hiera qkv/proj/MLP) sit near the bf16 roofline
(~16 ms of the 90 ms test step), so dynamic int8 quantization is the one
remaining lever on that slice of the profile.

Scheme (standard dynamic W8A8, no calibration data needed):
- weights: per-output-channel absmax scale, round-to-nearest to [-127, 127].
  Quantized from the live (bf16/f32) param tree INSIDE the jitted step —
  params are jit arguments (CLAUDE.md: never close over them), so the
  quantize re-runs each step (~<1 ms: one weight stream + a few VPU passes).
  In exchange the param tree layout stays IDENTICAL to `nn.Dense`
  (kernel [in, out], bias [out]): converted torch checkpoints load
  unchanged and `Int8Dense` is a drop-in. Pre-quantized int8 storage
  (kernel_q + scale leaves, quantize once at load) is the documented next
  step if a deployment ever makes the encoder GEMM slice dominant.
- activations: per-row (per-token) absmax scale, quantized on the fly.
- accumulate int32 on the MXU, rescale in f32, bias-add in f32, cast back
  to the module dtype.

This is OPT-IN (`MatchingConfig.encoder_quant = "int8"`): quantization
noise in the DINO features shifts matching scores and in Hiera shifts mask
logits, and without real checkpoints + datasets in this image the AP impact
cannot be validated — only numeric drift (tests/test_quant.py bounds it on
random weights). The decoder / prompt towers always stay in bf16/f32: their
GEMMs are a negligible slice of the step and they feed IoU/mask regression
heads directly.

Reference counterpart: none (the reference runs torch fp32/bf16 GEMMs,
no_time_to_train/models/model_utils.py:35-72); this is a TPU-specific
capability.
"""
import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["Int8Dense", "int8_dot", "dense_cls"]


def _absmax_scale(t, axis):
    s = jnp.max(jnp.abs(t), axis=axis, keepdims=True) / 127.0
    # all-zero rows/channels: any scale works, 1.0 avoids 0/0 -> NaN
    return jnp.where(s == 0.0, 1.0, s)


def int8_dot(x, kernel):
    """x: [..., C] (any float dtype), kernel: [C, F] -> f32 [..., F].

    Dynamic per-token activation scales, per-output-channel weight scales,
    int32 MXU accumulation. The quantize steps are VPU elementwise over
    arrays the GEMM streams anyway; the int8 operands then halve both the
    MXU time and the weight-side HBM traffic."""
    xf = x.astype(jnp.float32)
    xs = _absmax_scale(xf, axis=-1)                        # [..., 1]
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    ks = _absmax_scale(kf, axis=0)                         # [1, F]
    kq = jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ks


class Int8Dense(nn.Module):
    """Drop-in `nn.Dense` with W8A8 int8 matmul (see module docstring).

    Param tree (names, shapes, init, param dtype) is identical to
    `nn.Dense(features, dtype=dtype)`, so checkpoints and parity converters
    are oblivious to which one a model was built with."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        y = int8_dot(x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        dt = self.dtype if self.dtype is not None else x.dtype
        return y.astype(dt)


def dense_cls(quant):
    """Dense-layer factory: "none" -> nn.Dense, "int8" -> Int8Dense."""
    if quant == "int8":
        return Int8Dense
    assert quant in (None, "none"), quant
    return nn.Dense
