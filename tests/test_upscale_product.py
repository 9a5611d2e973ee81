"""Correctness of the fused post-t1 upscale Pallas kernel
(ops/upscale_product.py) — interpret mode vs its XLA reference, and both vs
the original unfused decoder formulation (conv-transpose semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.ops.upscale_product import (
    fused_post_t1, fused_post_t1_xla)


def _inputs(rng, b, hw, c1, c2, dtype=jnp.float32):
    return dict(
        t1=jnp.asarray(rng.standard_normal((b, hw, 4 * c1)) * 0.7, dtype),
        bias1_4=jnp.asarray(np.tile(rng.standard_normal(c1), 4), dtype),
        s1f=jnp.asarray(rng.standard_normal((hw, 4 * c1)) * 0.3, dtype),
        ln_w=jnp.asarray(rng.standard_normal(c1) * 0.2 + 1.0, jnp.float32),
        ln_b=jnp.asarray(rng.standard_normal(c1) * 0.1, jnp.float32),
        k2mat=jnp.asarray(rng.standard_normal((c1, 4 * c2)) * 0.1, dtype),
        bias2=jnp.asarray(rng.standard_normal(c2), jnp.float32),
        s0f16=jnp.asarray(rng.standard_normal((hw, 16 * c2)) * 0.3, dtype),
        hyper=jnp.asarray(rng.standard_normal((b, c2)), jnp.float32),
    )


def test_fused_post_t1_interpret():
    rng = np.random.default_rng(0)
    kw = _inputs(rng, b=8, hw=256, c1=64, c2=32)
    got = fused_post_t1(**kw, interpret=True)
    ref = fused_post_t1_xla(**kw)
    assert got.shape == (8, 256, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_post_t1_odd_blocks():
    """Block sizes that don't divide the defaults (pb/pt halving loop)."""
    rng = np.random.default_rng(1)
    kw = _inputs(rng, b=6, hw=192, c1=64, c2=32)
    got = fused_post_t1(**kw, interpret=True, prompt_block=4, pos_block=128)
    ref = fused_post_t1_xla(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_post_t1_xla_matches_unfused_chain():
    """The flat formulation equals the original decoder chain: deconv-phase
    reshape + LayerNorm over c1 + GELU + second deconv + skips + GELU +
    per-prompt hypernetwork product (same sums, reassociated)."""
    rng = np.random.default_rng(2)
    b, h, w, c1, c2 = 4, 8, 8, 64, 32
    hw = h * w
    kw = _inputs(rng, b=b, hw=hw, c1=c1, c2=c2)

    t8 = (kw["t1"].reshape(b, hw, 4, c1) + kw["bias1_4"].reshape(4, c1)
          + kw["s1f"].reshape(1, hw, 4, c1))
    mu = t8.mean(-1, keepdims=True)
    var = jnp.square(t8 - mu).mean(-1, keepdims=True)
    zn = (t8 - mu) * jax.lax.rsqrt(var + 1e-6) * kw["ln_w"] + kw["ln_b"]
    u = jax.nn.gelu(zn, approximate=False)
    t2 = jnp.einsum("bhpc,cm->bhpm", u, kw["k2mat"])     # [b, hw, 4, 4c2]
    z2 = (t2.reshape(b, hw, 4, 4, c2)
          + kw["bias2"]
          + kw["s0f16"].reshape(1, hw, 4, 4, c2))
    g = jax.nn.gelu(z2, approximate=False)
    ref = jnp.einsum("bc,bhpqc->bhpq", kw["hyper"], g).reshape(b, hw, 16)

    for got in (fused_post_t1_xla(**kw),
                fused_post_t1(**kw, interpret=True)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)


def test_fused_post_t1_phase_interleave():
    """The decoder's [B, hw, 16] -> [B, 4h, 4w] interleave places phase
    (dy1, dx1, dy2, dx2) at output pixel (4y+2dy1+dy2, 4x+2dx1+dx2)."""
    b, h, w = 1, 2, 2
    hw = h * w
    mask16 = np.zeros((b, hw, 16), np.float32)
    # encode each (position, phase) uniquely
    for pos in range(hw):
        for ph in range(16):
            mask16[0, pos, ph] = pos * 100 + ph
    m = (jnp.asarray(mask16).reshape(b, h, w, 2, 2, 2, 2)
         .transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, 4 * h, 4 * w))
    m = np.asarray(m)
    for y in range(4 * h):
        for x in range(4 * w):
            pos = (y // 4) * w + (x // 4)
            ph = ((y % 4) // 2) * 8 + ((x % 4) // 2) * 4 \
                + (y % 2) * 2 + (x % 2)
            assert m[0, y, x] == pos * 100 + ph, (y, x)


def test_fused_from_src_interpret():
    """k1mat path: the first-deconv GEMM runs in-kernel; equals XLA t1 GEMM
    + fused_post_t1_xla."""
    rng = np.random.default_rng(7)
    b, hw, d, c1, c2 = 8, 256, 256, 64, 32
    kw = _inputs(rng, b=b, hw=hw, c1=c1, c2=c2)
    src = jnp.asarray(rng.standard_normal((b, hw, d)) * 0.5, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((d, 4 * c1)) * 0.05, jnp.float32)
    kw.pop("t1")
    got = fused_post_t1(src, **kw, k1mat=k1, interpret=True)
    t1 = jnp.einsum("bhd,dm->bhm", src, k1)
    ref = fused_post_t1_xla(t1, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_post_t1_tpu_parity():
    """Compiled (non-interpret) kernel (k1mat in-kernel GEMM path) vs the
    XLA reference on the real TPU at flagship-like shapes."""
    import pytest
    import jax
    dev = next((d for d in jax.devices() if d.platform != "cpu"), None)
    if dev is None:
        pytest.skip("no TPU device available")
    rng = np.random.default_rng(12)
    b, hw, d, c1, c2 = 16, 4096, 256, 64, 32
    kw = _inputs(rng, b=b, hw=hw, c1=c1, c2=c2, dtype=jnp.bfloat16)
    src = jnp.asarray(rng.standard_normal((b, hw, d)) * 0.5, jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((d, 4 * c1)) * 0.05, jnp.bfloat16)
    kw.pop("t1")
    kw = {k: jax.device_put(v, dev) for k, v in kw.items()}
    src, k1 = jax.device_put(src, dev), jax.device_put(k1, dev)
    got = np.asarray(jax.jit(
        lambda s, kk, **a: fused_post_t1(s, **a, k1mat=kk))(src, k1, **kw),
        np.float32)
    t1 = jnp.einsum("bhd,dm->bhm", src, k1,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    ref = np.asarray(jax.jit(fused_post_t1_xla)(
        jax.device_put(t1, dev), **kw), np.float32)
    np.testing.assert_allclose(got, ref, atol=0.1, rtol=0.1)


def test_fused_post_t1_out_16pt_interpret():
    """Transposed-output variant ([B, 16, hw]) equals the standard layout."""
    rng = np.random.default_rng(8)
    kw = _inputs(rng, b=8, hw=256, c1=64, c2=32)
    std = fused_post_t1(**kw, interpret=True)
    tsp = fused_post_t1(**kw, out_16pt=True, interpret=True)
    np.testing.assert_allclose(np.asarray(tsp.transpose(0, 2, 1)),
                               np.asarray(std), rtol=1e-5, atol=1e-5)


def test_out_16pt_phase_interleave():
    """The decoder's [B, 16, hw] -> [B, 4h, 4w] interleave places phase
    (dy1, dx1, dy2, dx2) at output pixel (4y+2dy1+dy2, 4x+2dx1+dx2)."""
    b, h, w = 1, 2, 2
    hw = h * w
    m16 = np.zeros((b, 16, hw), np.float32)
    for pos in range(hw):
        for ph in range(16):
            m16[0, ph, pos] = pos * 100 + ph
    m = (jnp.asarray(m16).reshape(b, 2, 2, 2, 2, h, w)
         .transpose(0, 5, 1, 3, 6, 2, 4).reshape(b, 4 * h, 4 * w))
    m = np.asarray(m)
    for y in range(4 * h):
        for x in range(4 * w):
            pos = (y // 4) * w + (x // 4)
            ph = ((y % 4) // 2) * 8 + ((x % 4) // 2) * 4 \
                + (y % 2) * 2 + (x % 2)
            assert m[0, y, x] == pos * 100 + ph, (y, x)


def test_gelu_approx_accuracy():
    """Both bf16-path gelu approximations stay below bf16 output rounding at
    mask-logit magnitudes: the degree-9 polynomial within 1e-4 inside the
    fit range (|x|*3e-5 in the clamp tails), the hardware-tanh form (the
    currently wired one — see _chain_body) within 4e-3 everywhere."""
    from scipy.special import erf as _scipy_erf
    from no_time_to_train_tpu.ops.upscale_product import (_gelu_fast,
                                                          _gelu_tanh)
    xs = np.linspace(-20, 20, 200001)
    x = jnp.asarray(xs, jnp.float32)
    ref = xs * 0.5 * (1.0 + _scipy_erf(xs / np.sqrt(2.0)))
    err = np.abs(np.asarray(_gelu_fast(x), np.float64) - ref)
    inside = np.abs(xs) <= 4.0
    assert err[inside].max() < 1e-4
    assert (err[~inside] / np.abs(xs[~inside])).max() < 3e-5
    err_t = np.abs(np.asarray(_gelu_tanh(x), np.float64) - ref)
    assert err_t.max() < 4e-3


def test_fused_post_t1_bf16_uses_approx_gelu():
    """bf16 inputs route through the approximate gelu (tanh form); the
    result must agree with the exact-gelu XLA reference to bf16-scale
    tolerance."""
    rng = np.random.default_rng(5)
    kw = _inputs(rng, b=8, hw=256, c1=64, c2=32, dtype=jnp.bfloat16)
    got = fused_post_t1(**kw, interpret=True)
    ref = fused_post_t1_xla(**{k: (v.astype(jnp.float32)) for k, v in kw.items()})
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0.1, atol=0.1)
