"""Microbenchmark: the three fused decode kernels at flagship shapes,
sweeping their block sizes. Run on the TPU:
    python tools/bench_decoder_kernels.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    """Fence with a tiny sliced fetch — np.asarray(out) would pull the full
    (up to 537 MB) result through the tunnel and swamp the timing."""
    import jax
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out[(0,) * (out.ndim - 1)][:4])
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    np.asarray(out[(0,) * (out.ndim - 1)][:4])
    return (time.time() - t0) / n * 1e3


def main():
    from no_time_to_train_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import functools
    from no_time_to_train_tpu.ops.decoder_attention import (
        fused_i2t_norm, fused_t2i_attn)
    from no_time_to_train_tpu.ops.upscale_product import fused_post_t1

    rng = np.random.default_rng(0)
    p, n, c, i, t = 256, 4096, 256, 128, 8
    dt = jnp.bfloat16
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(x, dev)

    keys = put(jnp.asarray(rng.standard_normal((p, n, c)) * 0.5, dt))
    pe = put(jnp.asarray(rng.standard_normal((n, c)) * 0.5, dt))
    tok = put(jnp.asarray(rng.standard_normal((p, t, i)) * 0.5, dt))
    w_ci = put(jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32))
    w_ic = put(jnp.asarray(rng.standard_normal((i, c)) * 0.05, jnp.float32))
    b_i = put(jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32))
    b_c = put(jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32))
    nw = put(jnp.asarray(rng.standard_normal(c) * 0.2 + 1, jnp.float32))

    for bq in (512, 1024, 2048):
        ms = timeit(functools.partial(
            fused_i2t_norm, num_heads=8, pos_block=bq),
            keys, pe, tok, tok, w_ci, b_i, w_ic, b_c, nw, b_c)
        print(f"i2t  pos_block={bq:5d}  {ms:7.2f} ms", flush=True)

    for bk in (1024, 2048, 4096):
        ms = timeit(functools.partial(
            fused_t2i_attn, num_heads=8, pos_block=bk),
            keys, pe, tok, w_ci, b_i, w_ci, b_i)
        print(f"t2i  pos_block={bk:5d}  {ms:7.2f} ms", flush=True)

    c1, c2, hw = 64, 32, 4096
    src = put(jnp.asarray(rng.standard_normal((p, hw, c)) * 0.5, dt))
    k1 = put(jnp.asarray(rng.standard_normal((c, 4 * c1)) * 0.05, dt))
    b14 = put(jnp.asarray(np.tile(rng.standard_normal(c1), 4), jnp.float32))
    s1f = put(jnp.asarray(rng.standard_normal((hw, 4 * c1)) * 0.3, dt))
    lnw = put(jnp.asarray(rng.standard_normal(c1) * 0.2 + 1, jnp.float32))
    lnb = put(jnp.asarray(rng.standard_normal(c1) * 0.1, jnp.float32))
    k2 = put(jnp.asarray(rng.standard_normal((c1, 4 * c2)) * 0.1, dt))
    b2 = put(jnp.asarray(rng.standard_normal(c2), jnp.float32))
    s0f = put(jnp.asarray(rng.standard_normal((hw, 16 * c2)) * 0.3, dt))
    hyp = put(jnp.asarray(rng.standard_normal((p, c2)), jnp.float32))

    for pb, pt in ((8, 128), (8, 256), (8, 512), (16, 256), (32, 128)):
        try:
            ms = timeit(functools.partial(
                fused_post_t1, k1mat=k1, prompt_block=pb, pos_block=pt),
                src, b14, s1f, lnw, lnb, k2, b2, s0f, hyp)
            print(f"post_t1  pb={pb:2d} pt={pt:4d}  {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"post_t1  pb={pb:2d} pt={pt:4d}  FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
