"""Parity of the single-pass Pallas LayerNorm (ops/fused_ln.py) against the
XLA `_layer_norm` bf16 formulation it replaces — interpret mode on CPU, and
compiled at encoder shapes (incl. the non-128-multiple C=144 lane dim) when
a real TPU is visible."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from no_time_to_train_tpu.ops.fused_ln import (
    layer_norm_pallas, ln_fusible)


def _xla_ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    u = xf.mean(axis=-1, keepdims=True)
    s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(s + eps)
    y = (x - u.astype(x.dtype)) * inv.astype(x.dtype)
    return y * w.astype(x.dtype) + b.astype(x.dtype)


@pytest.mark.parametrize("shape", [(64, 32, 144), (2048, 256), (8, 576)])
def test_layer_norm_pallas_interpret(shape):
    rng = np.random.default_rng(0)
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape) * 2 + 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(c) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    got = np.asarray(layer_norm_pallas(x, w, b, 1e-6, interpret=True),
                     np.float32)
    ref = np.asarray(_xla_ln(x, w, b, 1e-6), np.float32)
    np.testing.assert_allclose(got, ref, atol=0.02, rtol=0.02)


def test_ln_fusible_gates():
    x16 = jnp.zeros((2048, 144), jnp.bfloat16)
    xf32 = jnp.zeros((2048, 144), jnp.float32)
    tiny = jnp.zeros((8, 144), jnp.bfloat16)
    odd = jnp.zeros((1023, 144), jnp.bfloat16)
    # CPU-pinned test session: everything is rejected by the device gate,
    # but dtype/shape gates must reject regardless
    assert not ln_fusible(xf32)
    assert not ln_fusible(tiny)
    assert not ln_fusible(odd)
    assert isinstance(ln_fusible(x16), bool)


def test_layer_norm_pallas_tpu_parity():
    dev = next((d for d in jax.devices() if d.platform != "cpu"), None)
    if dev is None:
        pytest.skip("no TPU device available")
    rng = np.random.default_rng(3)
    for shape in [(1024, 64, 144), (1024, 16, 288), (4096, 576),
                  (4096, 1152), (1370, 1024)]:
        if int(np.prod(shape[:-1])) % 8:
            continue
        c = shape[-1]
        x = jax.device_put(jnp.asarray(
            rng.standard_normal(shape) * 2 + 0.5, jnp.bfloat16), dev)
        w = jax.device_put(jnp.asarray(
            rng.standard_normal(c) * 0.2 + 1.0, jnp.float32), dev)
        b = jax.device_put(jnp.asarray(
            rng.standard_normal(c) * 0.1, jnp.float32), dev)
        got = np.asarray(jax.jit(
            lambda x, w, b: layer_norm_pallas(x, w, b, 1e-6))(x, w, b),
            np.float32)
        ref = np.asarray(jax.jit(
            lambda x, w, b: _xla_ln(x, w, b, 1e-6))(x, w, b), np.float32)
        np.testing.assert_allclose(got, ref, atol=0.02, rtol=0.02,
                                   err_msg=str(shape))
