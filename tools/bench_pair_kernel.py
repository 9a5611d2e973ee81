#!/usr/bin/env python
"""In-kernel cross-image batching experiment (VERDICT r4 #1): the broadcast
i2t decode kernel at flagship shapes, three ways —

  single : fused_i2t_norm, one image (the deployed B=1 pass)
  vmap   : jax.vmap(fused_i2t_norm) over 2 images (what test_batch_async
           compiles to — the batch becomes the OUTERMOST pallas grid dim,
           so only DMA pipelines across the image seam)
  pair   : fused_i2t_norm_pair, both images inside EACH grid step so
           Mosaic may overlap image 0's VPU softmax/LN with image 1's MXU
           GEMMs (cross-image compute overlap the grid cannot express)

Prints ms/pass and ms/image. Run on the TPU.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(np.asarray(out).ravel()[:4]) if isinstance(out, np.ndarray) \
        else np.asarray(out[(0,) * (out.ndim - 1)][:4])
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    np.asarray(out[(0,) * (out.ndim - 1)][:4])
    return (time.time() - t0) / n * 1e3


def main():
    from no_time_to_train_tpu.utils.cache import (enable_compilation_cache,
                                                  init_backend_bounded)
    enable_compilation_cache()
    init_backend_bounded(what="bench_pair_kernel backend init")
    import jax
    import jax.numpy as jnp
    import functools
    from no_time_to_train_tpu.ops.decoder_attention import (
        fused_i2t_norm, fused_i2t_norm_pair)

    rng = np.random.default_rng(0)
    p, n, c, i, t, h = 256, 4096, 256, 128, 8, 8
    dt = jnp.bfloat16
    put = jax.device_put

    keys2 = put(jnp.asarray(rng.standard_normal((2, 1, n, c)) * 0.5, dt))
    pe2 = put(jnp.asarray(rng.standard_normal((2, n, i)) * 0.5, dt))
    tk2 = put(jnp.asarray(rng.standard_normal((2, p, t, i)) * 0.5, dt))
    tv2 = put(jnp.asarray(rng.standard_normal((2, p, t, i)) * 0.5, dt))
    wq = put(jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32))
    bq = put(jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32))
    wout = put(jnp.asarray(rng.standard_normal((i, c)) * 0.05, jnp.float32))
    bout = put(jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32))
    nw = put(jnp.ones(c, jnp.float32))
    nb = put(jnp.zeros(c, jnp.float32))

    single = functools.partial(fused_i2t_norm, num_heads=h)
    ms1 = timeit(single, keys2[0], pe2[0], tk2[0], tv2[0], wq, bq, wout,
                 bout, nw, nb)
    print(f"single (1 img/pass):  {ms1:7.2f} ms/pass  {ms1:7.2f} ms/img",
          flush=True)

    vm = jax.vmap(single, in_axes=(0, 0, 0, 0) + (None,) * 6)
    ms2 = timeit(vm, keys2, pe2, tk2, tv2, wq, bq, wout, bout, nw, nb)
    print(f"vmap   (2 img/pass):  {ms2:7.2f} ms/pass  {ms2 / 2:7.2f} ms/img",
          flush=True)

    pair = functools.partial(fused_i2t_norm_pair, num_heads=h)
    ms3 = timeit(pair, keys2[:, 0], pe2, tk2, tv2, wq, bq, wout, bout, nw,
                 nb)
    print(f"pair   (2 img/step):  {ms3:7.2f} ms/pass  {ms3 / 2:7.2f} ms/img",
          flush=True)


if __name__ == "__main__":
    main()
