"""Microbenchmark: the mask-decoder upscale chain (first deconv -> LN ->
GELU -> second deconv -> skips -> GELU -> hypernetwork product) at flagship
decode-chunk shapes (B=256 prompts, 64x64 grid, d=256), three formulations:

  8d      round-1 XLA form (phase reshapes + LayerNorm2d + 8-d einsum)
  flat    t1 GEMM + fused_post_t1_xla (same contractions, lane-full, XLA)
  pallas  t1 GEMM + fused_post_t1 Pallas kernel (the wired TPU path)

Run on the TPU: python tools/bench_epilogue.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from no_time_to_train_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from no_time_to_train_tpu.ops.upscale_product import (
        fused_post_t1, fused_post_t1_xla)

    rng = np.random.default_rng(0)
    b, h, w, d = 256, 64, 64, 256
    c1, c2 = d // 4, d // 8
    hw = h * w
    dt = jnp.bfloat16
    src = jax.device_put(jnp.asarray(
        rng.standard_normal((b, hw, d)) * 0.5, dt))
    k1 = jax.device_put(jnp.asarray(
        rng.standard_normal((d, 4 * c1)) * 0.05, dt))
    bias1 = jax.device_put(jnp.asarray(rng.standard_normal(c1), jnp.float32))
    s1f = jax.device_put(jnp.asarray(
        rng.standard_normal((hw, 4 * c1)) * 0.3, dt))
    ln_w = jax.device_put(jnp.asarray(
        rng.standard_normal(c1) * 0.2 + 1, jnp.float32))
    ln_b = jax.device_put(jnp.asarray(
        rng.standard_normal(c1) * 0.1, jnp.float32))
    k2 = jax.device_put(jnp.asarray(
        rng.standard_normal((c1, 4 * c2)) * 0.1, dt))
    bias2 = jax.device_put(jnp.asarray(rng.standard_normal(c2), jnp.float32))
    s0f16 = jax.device_put(jnp.asarray(
        rng.standard_normal((hw, 16 * c2)) * 0.3, dt))
    hyper = jax.device_put(jnp.asarray(
        rng.standard_normal((b, c2)), jnp.float32))

    def t1_gemm(src, k1):
        return jnp.dot(src.reshape(b * hw, d), k1,
                       preferred_element_type=dt).reshape(b, hw, 4 * c1)

    @jax.jit
    def f_8d(src, k1, bias1, s1f, ln_w, ln_b, k2, bias2, s0f16, hyper):
        t1 = t1_gemm(src, k1).reshape(b, h, w, 2, 2, c1) \
            + bias1.astype(dt) + s1f.reshape(1, h, w, 2, 2, c1)
        t1f = t1.astype(jnp.float32)
        mu = t1f.mean(-1, keepdims=True)
        var = jnp.square(t1f - mu).mean(-1, keepdims=True)
        zn = (t1 - mu.astype(dt)) * jax.lax.rsqrt(var + 1e-6).astype(dt)
        zn = zn * ln_w.astype(dt) + ln_b.astype(dt)
        u = jax.nn.gelu(zn, approximate=False)
        t2 = jnp.dot(u.reshape(b * hw * 4, c1), k2, preferred_element_type=dt)
        t8 = (t2.reshape(b, h, w, 2, 2, 2, 2, c2) + bias2.astype(dt)
              + s0f16.reshape(1, h, w, 2, 2, 2, 2, c2))
        g = jax.nn.gelu(t8, approximate=False)
        m = jnp.einsum("bc,byxpqrsc->byxpqrs", hyper.astype(dt), g)
        return m.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, 4 * h, 4 * w)

    def _wrap(fn):
        @jax.jit
        def f(src, k1, bias1, s1f, ln_w, ln_b, k2, bias2, s0f16, hyper):
            t1 = t1_gemm(src, k1)
            m16 = fn(t1, jnp.tile(bias1, 4), s1f, ln_w, ln_b, k2, bias2,
                     s0f16, hyper)
            return (m16.reshape(b, h, w, 2, 2, 2, 2)
                    .transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, 4 * h, 4 * w))
        return f

    args = (src, k1, bias1, s1f, ln_w, ln_b, k2, bias2, s0f16, hyper)

    def timeit(fn, n=20):
        out = fn(*args)
        np.asarray(out[0, :2, :2], np.float32)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out[0, :2, :2], np.float32)
        return (time.time() - t0) / n * 1e3

    for name, fn in [("8d", f_8d), ("flat", _wrap(fused_post_t1_xla)),
                     ("pallas", _wrap(fused_post_t1))]:
        print(f"{name:8s} {timeit(fn):7.2f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
