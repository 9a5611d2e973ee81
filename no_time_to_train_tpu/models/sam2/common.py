"""Shared building blocks for the SAM2 stack (flax.linen, NHWC layout).

Mirrors the semantics of reference sam2/modeling/sam2_utils.py (MLP,
LayerNorm2d) with TPU-friendly layouts. Parameter names are chosen so that
torch state dicts convert mechanically (see utils/torch_convert.py).
"""
from typing import Callable, Sequence

import jax.numpy as jnp
import flax.linen as nn

ACT = {
    "relu": nn.relu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
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

    @nn.compact
    def __call__(self, x):
        act = ACT[self.activation]
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}", dtype=self.dtype)(x)
            if i < self.num_layers - 1:
                x = act(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


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
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
        y = (xf - u) / jnp.sqrt(s + self.eps)
        return (y * weight + bias).astype(self.dtype)


class LayerNorm(nn.Module):
    """torch-eps LayerNorm (default eps 1e-5 unless overridden)."""
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
        y = (xf - u) / jnp.sqrt(s + self.eps)
        return (y * weight + bias).astype(self.dtype)


def conv_transpose_2x2_s2(x, kernel, bias):
    """Exact equivalent of torch ConvTranspose2d(k=2, s=2) on NHWC input.

    kernel: [c_in, c_out, 2, 2] (torch layout). No-overlap case, expressed as a
    single einsum + reshape (MXU-friendly, no conv_transpose ambiguity).
    """
    b, h, w, _ = x.shape
    c_out = kernel.shape[1]
    t = jnp.einsum("bhwc,codx->bhdwxo", x, kernel.astype(x.dtype))
    y = t.reshape(b, h * 2, w * 2, c_out)
    return y + bias.astype(x.dtype)
