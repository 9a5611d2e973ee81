"""Microbenchmark: fused upscale+product Pallas kernel vs XLA at the
flagship decode-chunk shapes (B=256 prompts, 64x64 grid, d=256).

Scans (prompt_block, pos_block) and prints per-variant ms/chunk. Run on the
TPU: python tools/bench_upscale.py
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
        fused_upscale_mask, fused_upscale_mask_xla)

    rng = np.random.default_rng(0)
    b, h, w, d = 256, 64, 64, 256
    c1, c2 = d // 4, d // 8
    dt = jnp.bfloat16
    hw = h * w
    kw = dict(
        src_flat=jax.device_put(jnp.asarray(
            rng.standard_normal((b, hw, d)) * 0.5, dt)),
        k1mat=jax.device_put(jnp.asarray(
            rng.standard_normal((d, 4 * c1)) * 0.05, dt)),
        bias1=jax.device_put(jnp.asarray(rng.standard_normal(4 * c1), dt)),
        s1u=jax.device_put(jnp.asarray(
            rng.standard_normal((hw, 4 * c1)), dt)),
        ln_w=jax.device_put(jnp.ones(c1, jnp.float32)),
        ln_b=jax.device_put(jnp.zeros(c1, jnp.float32)),
        k2mat=jax.device_put(jnp.asarray(
            rng.standard_normal((c1, 4 * c2)) * 0.1, dt)),
        bias2=jax.device_put(jnp.asarray(rng.standard_normal(4 * c2), dt)),
        s0u=jax.device_put(jnp.asarray(
            rng.standard_normal((hw, 4, 4 * c2)), dt)),
        hyper=jax.device_put(jnp.asarray(
            rng.standard_normal((b, c2)), jnp.float32)),
    )

    def timeit(fn, n=10):
        out = fn()
        np.asarray(out[0, :2, :2], np.float32)  # force completion
        t0 = time.time()
        for _ in range(n):
            out = fn()
        np.asarray(out[0, :2, :2], np.float32)
        return (time.time() - t0) / n * 1e3

    # arrays must travel as jit ARGUMENTS: closing over them bakes them into
    # the program as constants, which the axon remote-compile service
    # rejects at these sizes (HTTP 413) and which the repo's driver rules
    # forbid anyway (__graft_entry__.py)
    if "--with-xla" in sys.argv:
        # NOTE: this standalone XLA reference compiles pathologically slowly
        # at flagship shapes (>40 min observed); the in-pipeline cost of the
        # chain is known from the profiler instead (~15.8 ms/chunk).
        xla_f = jax.jit(lambda kws: fused_upscale_mask_xla(h=h, w=w, **kws))
        try:
            ms = timeit(lambda: xla_f(kw))
            print(f"xla reference:            {ms:8.2f} ms/chunk", flush=True)
        except Exception as e:
            print(f"xla reference FAILED: {type(e).__name__}: {e}",
                  flush=True)

    for pb, pt in [(8, 512), (8, 1024), (16, 512), (16, 1024), (4, 1024),
                   (8, 2048), (32, 512), (8, 256), (16, 256)]:
        try:
            jf = jax.jit(lambda kws, pb=pb, pt=pt: fused_upscale_mask(
                h=h, w=w, prompt_block=pb, pos_block=pt, **kws))
            f = lambda: jf(kw)
            ms = timeit(f)
            print(f"pallas pb={pb:<3d} pt={pt:<5d}: {ms:8.2f} ms/chunk",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"pallas pb={pb:<3d} pt={pt:<5d}: FAILED "
                  f"{type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
