#!/usr/bin/env python
"""Benchmark the Hiera-L trunk (and optionally DINOv2-L) forward alone on
the TPU — the iteration harness for the round-3 encoder fusion work.

Microbenchmarks through the axon tunnel are only trusted for RELATIVE
comparisons with a tiny fence fetch (CLAUDE.md); final numbers come from
bench.py e2e."""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dino", action="store_true")
    ap.add_argument("--profile", default=None,
                    help="trace dir for jax.profiler")
    args = ap.parse_args()

    from no_time_to_train_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from no_time_to_train_tpu.config.presets import SAM2_PRESETS
    from no_time_to_train_tpu.models.sam2.hiera import Hiera
    from no_time_to_train_tpu.models.matching.pipeline import (
        _random_params_like)

    cfg = SAM2_PRESETS["sam2_hiera_l.yaml"]
    model = Hiera(embed_dim=cfg.embed_dim, num_heads=cfg.num_heads,
                  stages=cfg.stages, global_att_blocks=cfg.global_att_blocks,
                  window_pos_embed_bkg_spatial_size=(
                      cfg.window_pos_embed_bkg_spatial_size),
                  window_spec=cfg.window_spec, dtype=jnp.bfloat16)
    x = np.random.default_rng(0).random((1, 1024, 1024, 3), np.float32)
    params = _random_params_like(
        lambda k: model.init(k, jnp.zeros((1, 1024, 1024, 3))),
        jax.random.PRNGKey(0), 0, cache_tag=("bench_hiera_l",))
    params = jax.device_put(jax.tree.map(jnp.asarray, params))
    xd = jax.device_put(jnp.asarray(x, jnp.bfloat16))

    fwd = jax.jit(lambda p, v: model.apply({"params": p}, v))

    def step():
        outs = fwd(params, xd)
        np.asarray(outs[-1][0, 0, :2, 0])  # tiny fence

    t0 = time.time()
    step()
    print(f"compile+first {time.time() - t0:.1f}s")
    step()
    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    for _ in range(args.steps):
        step()
    dt = (time.time() - t0) / args.steps * 1e3
    if args.profile:
        jax.profiler.stop_trace()
    print(f"hiera-L fwd: {dt:.2f} ms/step over {args.steps} steps")

    if args.dino:
        from no_time_to_train_tpu.config.presets import ENCODER_PRESETS
        from no_time_to_train_tpu.models.dino import DinoV2
        enc = ENCODER_PRESETS["dinov2_large"]
        dm = DinoV2(enc, dtype=jnp.bfloat16)
        dp = _random_params_like(
            lambda k: dm.init(k, jnp.zeros((1, enc.img_size, enc.img_size,
                                            3))),
            jax.random.PRNGKey(1), 1, cache_tag=("bench_dino_l",))
        dp = jax.device_put(jax.tree.map(jnp.asarray, dp))
        xi = jax.device_put(jnp.asarray(np.random.default_rng(1).random(
            (1, enc.img_size, enc.img_size, 3)), jnp.bfloat16))
        dfwd = jax.jit(lambda p, v: dm.apply({"params": p}, v))

        def dstep():
            o = dfwd(dp, xi)
            np.asarray(o[0, 0, :2])

        t0 = time.time()
        dstep()
        print(f"dino compile+first {time.time() - t0:.1f}s")
        dstep()
        t0 = time.time()
        for _ in range(args.steps):
            dstep()
        print(f"dino-L fwd: {(time.time() - t0) / args.steps * 1e3:.2f} "
              f"ms/step")


if __name__ == "__main__":
    main()
