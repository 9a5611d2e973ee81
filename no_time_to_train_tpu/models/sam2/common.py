"""Shared building blocks for the SAM2 stack (flax.linen, NHWC layout).

Mirrors the semantics of reference sam2/modeling/sam2_utils.py (MLP,
LayerNorm2d) with TPU-friendly layouts. Parameter names are chosen so that
torch state dicts convert mechanically (see utils/torch_convert.py).
"""
import jax
import jax.numpy as jnp
import flax.linen as nn

def _gelu_act(x):
    """Exact-erf gelu on the f32 path (bit-compatible with the torch parity
    oracles, which use nn.GELU's exact form); tanh-approximate on the bf16
    compute path. XLA lowers tanh natively on the TPU VPU while erf costs
    ~35 ops/element — profiled at ~8 ms/step recomputed inside the encoder
    MLP down-GEMM prologue fusions (0.605 vs 0.144 ms for the stage-1 down
    GEMM in isolation). The tanh form's max deviation from exact gelu
    (~3e-3 near |x|=2) is at bf16 output rounding magnitude."""
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


ACT = {
    "relu": nn.relu,
    "gelu": _gelu_act,
}


class MLP(nn.Module):
    """Reference sam2_utils.MLP: num_layers Linear stack with activation on all
    but the last, optional sigmoid output."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    activation: str = "relu"
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        from no_time_to_train_tpu.ops.quant import dense_cls
        D = dense_cls(self.quant)
        act = ACT[self.activation]
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = D(out, name=f"layers_{i}", dtype=self.dtype)(x)
            if i < self.num_layers - 1:
                x = act(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


def _layer_norm(x, weight, bias, eps, dtype):
    """Statistics accumulate in fp32 (fused into the reduction by XLA); the
    elementwise normalize runs in the compute dtype — in bf16 mode this halves
    the HBM traffic of the per-prompt key norms, which profiling showed as a
    top cost of the grid decode. In fp32 mode it is bit-identical to the
    all-fp32 formulation used by the parity tests."""
    if dtype != jnp.float32 and x.dtype == dtype:
        # bf16 encoder norms: one Pallas pass instead of XLA's convert+
        # reduce fusion pair (f32 intermediates + packed-layout relayouts,
        # ~11 ms/step across the Hiera/DINO blocks at flagship shapes);
        # same stats dtype and cast points, see ops/fused_ln.py
        from no_time_to_train_tpu.ops.fused_ln import (
            ln_fusible, layer_norm_pallas)
        if ln_fusible(x):
            return layer_norm_pallas(x, weight, bias, eps)
    xf = x.astype(jnp.float32)
    u = xf.mean(axis=-1, keepdims=True)
    s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(s + eps)
    if dtype == jnp.float32:
        y = (xf - u) * inv
        return y * weight + bias
    y = (x - u.astype(dtype)) * inv.astype(dtype)
    return y * weight.astype(dtype) + bias.astype(dtype)


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over the last axis of NHWC tensors (population var,
    eps inside sqrt) — matches reference LayerNorm2d on NCHW."""
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return _layer_norm(x, weight, bias, self.eps, self.dtype)


class LayerNorm2dP(nn.Module):
    """LayerNorm2d with explicit `features` and setup-declared params, so a
    parent module can read `.weight`/`.bias` directly (the mask decoder's
    fused Pallas upscale path needs the raw arrays without tracing a call).
    Same param tree and semantics as LayerNorm2d."""
    features: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.weight = self.param("weight", nn.initializers.ones,
                                 (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x):
        return _layer_norm(x, self.weight, self.bias, self.eps, self.dtype)


class LayerNormP(LayerNorm2dP):
    """torch-eps LayerNormP: setup-declared params (readable as `.weight` /
    `.bias` without tracing a call — used by the fused decoder kernels)."""
    eps: float = 1e-5


class LayerNorm(nn.Module):
    """torch-eps LayerNorm (default eps 1e-5 unless overridden)."""
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return _layer_norm(x, weight, bias, self.eps, self.dtype)


def conv_transpose_2x2_s2(x, kernel, bias):
    """Exact equivalent of torch ConvTranspose2d(k=2, s=2) on NHWC input.

    kernel: [c_in, c_out, 2, 2] (torch layout). No-overlap case: one dense
    GEMM [BHW, c_in] @ [c_in, 4*c_out] followed by a subpixel shuffle — XLA
    lowered the naive 6-d einsum as a tiny-kernel convolution at ~6% MXU
    utilization (profiled); the flat GEMM hits the MXU properly.
    """
    b, h, w, c_in = x.shape
    c_out = kernel.shape[1]
    # [c_in, c_out, dy, dx] -> [c_in, dy, dx, c_out] -> [c_in, 4*c_out]
    kmat = kernel.transpose(0, 2, 3, 1).reshape(c_in, 4 * c_out)
    t = jnp.dot(x.reshape(b * h * w, c_in), kmat.astype(x.dtype),
                preferred_element_type=x.dtype)
    t = t.reshape(b, h, w, 2, 2, c_out).transpose(0, 1, 3, 2, 4, 5)
    y = t.reshape(b, h * 2, w * 2, c_out)
    return y + bias.astype(x.dtype)
