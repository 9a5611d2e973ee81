"""Microbenchmark: Pallas flash attention vs fused XLA SDPA at this
framework's long-sequence shapes (VERDICT r1 #3 keep-or-revert measurement).

Shapes:
  - Hiera-L global blocks, single image:  [1, H, 4096, D]
  - Hiera-L global blocks, batched (B=4): [4, H, 4096, D]
  - decoder image-side self-ish shape:    [8, 8, 4096, 32]

Run on the TPU: python tools/bench_flash_attention.py
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
    from no_time_to_train_tpu.ops.attention import sdpa

    rng = np.random.default_rng(0)

    def timeit(f, *args, n=20):
        out = f(*args)
        np.asarray(out[..., 0, 0], np.float32)
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        np.asarray(out[..., 0, 0], np.float32)
        return (time.time() - t0) / n * 1e3

    shapes = [
        ("hiera-global B=1 (L: d=576, 9h)", (1, 9, 4096, 64)),
        ("hiera-global B=4", (4, 9, 4096, 64)),
        ("hiera-global B=8", (8, 9, 4096, 64)),
        ("memory-attn-ish 8x8x4096x32", (8, 8, 4096, 32)),
    ]
    for name, (b, h, n_, d) in shapes:
        q = jax.device_put(jnp.asarray(
            rng.standard_normal((b, h, n_, d)) * 0.3, jnp.bfloat16))
        k = jax.device_put(jnp.asarray(
            rng.standard_normal((b, h, n_, d)) * 0.3, jnp.bfloat16))
        v = jax.device_put(jnp.asarray(
            rng.standard_normal((b, h, n_, d)) * 0.3, jnp.bfloat16))
        f_x = jax.jit(lambda q, k, v: sdpa(q, k, v, impl="xla"))
        f_p = jax.jit(lambda q, k, v: sdpa(q, k, v, impl="pallas"))
        ms_x = timeit(f_x, q, k, v)
        ms_p = timeit(f_p, q, k, v)
        # parity check on the same data
        ox = np.asarray(f_x(q, k, v), np.float32)
        op = np.asarray(f_p(q, k, v), np.float32)
        err = np.abs(ox - op).max()
        print(f"{name:36s} xla {ms_x:7.3f} ms | pallas {ms_p:7.3f} ms | "
              f"max|diff| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
