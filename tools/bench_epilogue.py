"""Microbenchmark: the second-deconv + GELU + skip + hypernetwork-product
chain at flagship decode-chunk shapes (B=256 prompts, 64x64 source grid ->
16384 rows/prompt after the first 2x deconv phases, c1=64, c2=32), three
formulations:

  8d      original 8-d einsum form (XLA reconstructs the transposed conv)
  flat    lane-full GEMM + XLA epilogue (upscale_epilogue_xla)
  pallas  lane-full GEMM + Pallas epilogue kernel (upscale_epilogue)

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
        upscale_epilogue, upscale_epilogue_xla)

    rng = np.random.default_rng(0)
    b, h, w = 256, 64, 64       # decoder source grid (mask_decoder h, w)
    c1, c2 = 64, 32
    dt = jnp.bfloat16
    rows = h * w * 4
    u = jax.device_put(jnp.asarray(
        rng.standard_normal((b * h * w * 4, c1)) * 0.5, dt))
    k2 = jax.device_put(jnp.asarray(
        rng.standard_normal((c1, 4 * c2)) * 0.1, dt))
    bias4 = jax.device_put(jnp.asarray(rng.standard_normal(4 * c2), dt))
    s0f = jax.device_put(jnp.asarray(rng.standard_normal((rows, 4 * c2)), dt))
    hyper = jax.device_put(jnp.asarray(
        rng.standard_normal((b, c2)), jnp.float32))

    @jax.jit
    def f_8d(u, k2, bias4, s0f, hyper):
        t2 = jnp.dot(u, k2, preferred_element_type=dt)
        t8 = (t2.reshape(b, h, w, 2, 2, 2, 2, c2)
              + bias4.reshape(2, 2, c2) + s0f.reshape(1, h, w, 2, 2, 2, 2, c2))
        g = jax.nn.gelu(t8, approximate=False)
        m = jnp.einsum("bc,byxpqrsc->byxpqrs", hyper.astype(dt), g)
        return m.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, 4 * h, 4 * w)

    @jax.jit
    def f_flat(u, k2, bias4, s0f, hyper):
        t2 = jnp.dot(u, k2, preferred_element_type=dt).reshape(b, rows, 4 * c2)
        mu = upscale_epilogue_xla(t2, bias4, s0f, hyper)
        return (mu.reshape(b, 2, 2, h, w, 2, 2)
                .transpose(0, 3, 5, 1, 4, 6, 2).reshape(b, 4 * h, 4 * w))

    @jax.jit
    def f_pallas(u, k2, bias4, s0f, hyper):
        t2 = jnp.dot(u, k2, preferred_element_type=dt).reshape(b, rows, 4 * c2)
        mu = upscale_epilogue(t2, bias4, s0f, hyper)
        return (mu.reshape(b, 2, 2, h, w, 2, 2)
                .transpose(0, 3, 5, 1, 4, 6, 2).reshape(b, 4 * h, 4 * w))

    def timeit(fn, n=20):
        out = fn(u, k2, bias4, s0f, hyper)
        np.asarray(out[0, :2, :2], np.float32)
        t0 = time.time()
        for _ in range(n):
            out = fn(u, k2, bias4, s0f, hyper)
        np.asarray(out[0, :2, :2], np.float32)
        return (time.time() - t0) / n * 1e3

    for name, fn in [("8d", f_8d), ("flat", f_flat), ("pallas", f_pallas)]:
        print(f"{name:8s} {timeit(fn):7.2f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
