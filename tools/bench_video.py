#!/usr/bin/env python
"""Video-propagation throughput of the SAM2 video predictor on the
available accelerator (SAM2-L @ 1024^2, 1 object, point prompt on frame 0).

The reference's video observability lives in the SAM3 comparison harness
(scripts/run_nttt_eval.sh:26-60 polls FPS + GPU memory around
sam2_video_predictor propagation); this is the equivalent standalone
number for the TPU port: steady-state ms/frame of `propagate_in_video`
after the jit warmup frame, prompt + warmup excluded. The generator
yields lazy DEVICE arrays (like the reference yielding GPU tensors), so
the bench streams 1-deep — fetching frame t-1 (np.asarray) while frame t
computes — which is how a real consumer should drain it.

Two passes: pass 1 (fresh state) takes the compiles; pass 2 (fresh state,
re-prompted) is timed end-to-end — per-yield timing would misattribute the
chunked-scan path's burst yields (one device dispatch covers scan_chunk
frames), so steady-state ms/frame is total pass-2 wall over tracked frames.

Usage: python tools/bench_video.py [--frames 32] [--size 1024] [--objs 1]
                                   [--scan 8]   # 0 = per-frame path
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)  # >= 3 (2 warmup)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--objs", type=int, default=1)
    ap.add_argument("--scan", type=int, default=None,
                    help="scan_chunk override (0 = per-frame path)")
    ap.add_argument("--config", default="sam2_hiera_l.yaml")
    args = ap.parse_args()
    if args.frames < 3:
        ap.error("--frames must be >= 3 (the first two frames are prompt "
                 "and compile warmup; steady-state needs at least one more)")

    from no_time_to_train_tpu.utils.cache import (enable_compilation_cache,
                                                  init_backend_bounded)
    enable_compilation_cache()
    init_backend_bounded(what="bench_video jax backend init")
    import jax
    import dataclasses

    from no_time_to_train_tpu.config.presets import SAM2_PRESETS
    from no_time_to_train_tpu.models.matching.pipeline import (
        _random_params_like)
    from no_time_to_train_tpu.models.sam2.model import SAM2
    from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = dataclasses.replace(SAM2_PRESETS[args.config],
                              image_size=args.size)
    model = SAM2(cfg, dtype=dtype)

    t0 = time.time()
    key = jax.random.PRNGKey(0)
    params = _random_params_like(
        lambda k: model.init(k, jnp.zeros((1, args.size, args.size, 3)),
                             method=model.init_everything),
        key, 0, cache_tag=("sam2", repr(cfg)))
    # host-side compute-dtype cast + one device_put (the pipeline's
    # convention: bf16 params feed bf16 MXU GEMMs and halve the upload)
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda a: (np.asarray(a).astype(np.dtype(dtype))
                       if jnp.issubdtype(np.asarray(a).dtype, jnp.floating)
                       else np.asarray(a)), params)
    from no_time_to_train_tpu.utils.transfer import packed_device_put
    params = packed_device_put(params)  # one transfer/dtype over the tunnel
    pred = SAM2VideoPredictor(model, params)
    init_s = time.time() - t0

    rng = np.random.default_rng(0)
    frames = rng.random((args.frames, args.size, args.size, 3),
                        np.float32)
    # a moving bright square so masks are non-degenerate
    for t in range(args.frames):
        x0 = (args.size // 8 + 9 * t) % (args.size - args.size // 4)
        frames[t, args.size // 4:args.size // 2,
               x0:x0 + args.size // 4] = 0.9

    if args.scan is not None:
        pred.scan_chunk = args.scan

    def run_pass(stream=True):
        """One full prompt + propagation; returns (prompt_s, track_s,
        n_tracked). Streams 1-deep like a real consumer — fetch frame t-1
        while frame t computes (the propagation itself is sequentially
        dependent, so this hides only the D2H leg)."""
        t0 = time.time()
        state = pred.init_state(frames)
        for j in range(args.objs):
            y = args.size * 3 // 8 + 7 * j
            pred.add_new_points_or_box(
                state, 0, j + 1,
                points=np.array([[args.size // 4, y]], np.float32),
                labels=np.array([1], np.int32))
        prompt_s = time.time() - t0
        t0 = time.time()
        n = 0
        pend = None
        for fidx, obj_ids, masks in pred.propagate_in_video(state):
            if pend is not None:
                np.asarray(pend)
            pend = masks
            n += 1
        if pend is not None:
            np.asarray(pend)
        return prompt_s, time.time() - t0, n - 1  # frame 0 is the prompt

    # pass 1 takes every compile; pass 2 is the steady-state measurement
    prompt_s, compile_s, _ = run_pass()
    _, track_s, n_tracked = run_pass()
    ms = 1000.0 * track_s / max(n_tracked, 1)
    fps = 1000.0 / ms
    print(f"# init {init_s:.1f}s, prompt(+compile) {prompt_s:.1f}s, "
          f"first pass (compile) {compile_s:.1f}s, "
          f"steady {ms:.0f} ms/frame = {fps:.2f} frames/s "
          f"({args.objs} obj, {args.size}px, {n_tracked} frames timed, "
          f"scan_chunk={pred.scan_chunk}, "
          f"backend={jax.default_backend()})", file=sys.stderr)
    import json
    print(json.dumps({"metric": f"video propagation ({args.config}, "
                                f"{args.objs} obj, {args.size}px)",
                      "value": round(fps, 3), "unit": "frames/s"}))


if __name__ == "__main__":
    main()
