"""Profile video propagation on the TPU and print a per-op cost table.

Same trace machinery as profile_test_step.py, pointed at the video
predictor: warms one full propagation pass (compiles), then traces a second
pass at the chosen scan_chunk. Use --scan 0 vs --scan 8 traces to compare
the per-frame fused path against the chunked-scan path.

Usage: python tools/profile_video.py [--frames 17] [--scan 8] [--objs 1]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_test_step import parse_trace, parse_trace_joint  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--objs", type=int, default=1)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--config", default="sam2_hiera_l.yaml")
    ap.add_argument("--logdir", default="/tmp/nttt_video_trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--joint", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.logdir, args.top)
        if args.joint:
            parse_trace_joint(args.logdir, args.top, args.frames - 1)
        return

    from no_time_to_train_tpu.utils.cache import (enable_compilation_cache,
                                                  init_backend_bounded)
    enable_compilation_cache()
    init_backend_bounded(what="profile_video jax backend init")
    import jax
    import dataclasses
    import jax.numpy as jnp

    from no_time_to_train_tpu.config.presets import SAM2_PRESETS
    from no_time_to_train_tpu.models.matching.pipeline import (
        _random_params_like)
    from no_time_to_train_tpu.models.sam2.model import SAM2
    from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = dataclasses.replace(SAM2_PRESETS[args.config],
                              image_size=args.size)
    model = SAM2(cfg, dtype=dtype)
    key = jax.random.PRNGKey(0)
    params = _random_params_like(
        lambda k: model.init(k, jnp.zeros((1, args.size, args.size, 3)),
                             method=model.init_everything),
        key, 0, cache_tag=("sam2", repr(cfg)))
    if dtype != jnp.float32:
        params = jax.tree.map(
            lambda a: (np.asarray(a).astype(np.dtype(dtype))
                       if jnp.issubdtype(np.asarray(a).dtype, jnp.floating)
                       else np.asarray(a)), params)
    params = jax.device_put(params)
    pred = SAM2VideoPredictor(model, params)
    pred.scan_chunk = args.scan

    rng = np.random.default_rng(0)
    frames = rng.random((args.frames, args.size, args.size, 3), np.float32)
    for t in range(args.frames):
        x0 = (args.size // 8 + 9 * t) % (args.size - args.size // 4)
        frames[t, args.size // 4:args.size // 2, x0:x0 + args.size // 4] = 0.9

    def run_pass():
        state = pred.init_state(frames)
        for j in range(args.objs):
            y = args.size * 3 // 8 + 7 * j
            pred.add_new_points_or_box(
                state, 0, j + 1,
                points=np.array([[args.size // 4, y]], np.float32),
                labels=np.array([1], np.int32))
        t0 = time.time()
        pend = None
        n = 0
        for fidx, obj_ids, masks in pred.propagate_in_video(state):
            if pend is not None:
                np.asarray(pend)
            pend = masks
            n += 1
        if pend is not None:
            np.asarray(pend)
        return time.time() - t0, n - 1

    t0 = time.time()
    run_pass()
    print(f"warm pass (compile) {time.time() - t0:.1f}s", file=sys.stderr)

    jax.profiler.start_trace(args.logdir)
    dt, n = run_pass()
    jax.profiler.stop_trace()
    print(f"traced pass: {1e3 * dt / n:.0f} ms/frame over {n} tracked "
          f"frames (scan_chunk={pred.scan_chunk})", file=sys.stderr)
    parse_trace(args.logdir, args.top)
    if args.joint:
        parse_trace_joint(args.logdir, args.top, n)


if __name__ == "__main__":
    main()
