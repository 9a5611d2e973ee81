"""Benchmark: end-to-end test-phase throughput of the flagship configuration
(SAM2 Hiera-L + DINOv2-L, 10-shot memory bank, 32x32 point grid, COCO-style
single-image steps) on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reported metric is pipelined throughput: steps submitted 2-deep with the
previous step's completion fetched while the next computes — exactly how the
runner streams the dataset (runner.py), and the regime the reference's FPS
summary measures over a full val run. The per-image fenced latency (one
synchronized forward, the reference's sam2matcher_pl.py:177-191 timing) is
printed alongside on stderr. Host-side result transfer + RLE encoding happen
outside the timed section in both implementations. Completion is forced by
fetching the (tiny) score vector, since bare block_until_ready returns early
through the axon remote-TPU tunnel.

Cold start rides the AOT path (utils/aot.py): a fingerprinted pre-serialized
TPU executable is loaded when present (seconds instead of the ~6 min cold /
~1 min warm-cache jit compile) and (re)exported here on miss so the next cold
start is fast. Init is attributed leg by leg on stderr (param init / cast +
device_put dispatch / upload fence / bank postprocess / AOT).

The stderr tail also carries the canonical video-propagation numbers
(1-obj and 3-obj ms/frame, 64 frames, SAM2-L @ 1024) so every driver capture
records them; disable with --video=0 for quick image-path A/Bs.

vs_baseline: the reference repo commits no throughput numbers (SURVEY §6), so
the baseline is an estimate of the reference pipeline on one A100: the fp32
test step costs ~4.5 TFLOPs/image (two ViT forwards + a 1024-prompt decode in
4 serial microbatches) and the published pipeline runs fp32 (precision: 32),
giving ~1.5 img/s on one A100. Replace with a measured number when reference
hardware exists.
"""
import json
import sys
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 1.5  # img/s, reference on one A100 (see docstring)

N_WARMUP = 2
N_ITERS = 8


def _fence_upload(*trees):
    """Force every leaf of the given pytrees onto the device and wait.
    block_until_ready returns early through the axon tunnel, so the fence is
    a tiny jitted reduction over all leaves whose scalar result is fetched."""
    import jax
    import jax.numpy as jnp

    def touch(ts):
        return sum(l.reshape(-1)[0].astype(jnp.float32)
                   for l in jax.tree.leaves(ts) if l.size)
    return float(jax.jit(touch)(trees))


def _bench_video(matcher, n_frames, objs):
    """Steady-state video propagation ms/frame on the matcher's live SAM2-L
    params (no second param init/upload — one axon client per host). Same
    two-pass protocol as tools/bench_video.py: pass 1 takes the compiles,
    pass 2 is timed end-to-end over the tracked frames."""
    from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor
    size = matcher.sam2_cfg.image_size
    pred = SAM2VideoPredictor(matcher.sam2, matcher.sam2_params)

    rng = np.random.default_rng(0)
    frames = rng.random((n_frames, size, size, 3), np.float32)
    for t in range(n_frames):  # a moving bright square: non-degenerate masks
        x0 = (size // 8 + 9 * t) % (size - size // 4)
        frames[t, size // 4:size // 2, x0:x0 + size // 4] = 0.9

    def run_pass():
        state = pred.init_state(frames)
        for j in range(objs):
            pred.add_new_points_or_box(
                state, 0, j + 1,
                points=np.array([[size // 4, size * 3 // 8 + 7 * j]],
                                np.float32),
                labels=np.array([1], np.int32))
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
        return time.time() - t0, n - 1  # frame 0 is the prompt

    run_pass()                          # compiles
    track_s, n_tracked = run_pass()
    return 1000.0 * track_s / max(n_tracked, 1), n_tracked


def main():
    from no_time_to_train_tpu.utils.cache import (enable_compilation_cache,
                                                  init_backend_bounded)
    enable_compilation_cache()
    try:
        init_backend_bounded(what="bench.py jax backend init")
    except RuntimeError as e:
        print(f"bench.py: {e}", file=sys.stderr)
        sys.exit(1)
    import jax

    from no_time_to_train_tpu.models.matching.pipeline import (
        NoAMGMatcher, MatchingConfig)
    from no_time_to_train_tpu.models.matching import memory_bank as mb

    compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    attention_impl = "pallas"
    decoder_impl = "dense"
    batch = 1
    point_bs = 256
    depth = 2
    # depth default 2 since round 5: the window-attention kernel + NMS unroll
    # dropped device time to ~86.6 ms/step, which leaves the per-step
    # dispatch+fetch RTT visible at depth 1 through the remote-TPU tunnel
    # (93 ms at depth 1 vs 91 at depth 2/3, measured); the runner's loop is
    # structurally 2-deep already
    quant = "none"
    video = 1
    use_aot = 1
    for a in sys.argv[1:]:
        if a.startswith("--attention-impl="):
            attention_impl = a.split("=")[1]
        if a.startswith("--decoder-impl="):
            decoder_impl = a.split("=")[1]
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--point-bs="):
            point_bs = int(a.split("=")[1])
        if a.startswith("--depth="):
            depth = int(a.split("=")[1])
        if a.startswith("--quant="):
            quant = a.split("=")[1]  # "int8": W8A8 encoder GEMMs (opt-in)
        if a.startswith("--video="):
            video = int(a.split("=")[1])
        if a.startswith("--aot="):
            use_aot = int(a.split("=")[1])
    # a typo'd A/B flag must fail loudly, not silently bench the default
    assert attention_impl in ("pallas", "xla"), attention_impl
    assert decoder_impl in ("dense", "factored"), decoder_impl
    assert quant in ("none", "int8"), quant
    matching = MatchingConfig(compute_dtype=compute_dtype,
                              attention_impl=attention_impl,
                              decoder_impl=decoder_impl,
                              testing_point_bs=point_bs,
                              encoder_quant=quant)
    t0 = time.time()
    matcher = NoAMGMatcher("sam2_hiera_l.yaml", "dinov2_large", matching,
                           n_classes=20, memory_length=10)
    legs = dict(matcher.init_timings)     # param_init_s, cast_device_put_s
    t0 = time.time()
    _fence_upload(matcher.sam2_params, matcher.dino_params)
    legs["upload_s"] = time.time() - t0   # wire transfer (+ tiny jit fence)
    t0 = time.time()
    matcher.bank = mb.postprocess(matcher.bank)
    np.asarray(matcher.bank.feats_avg)  # sync
    legs["bank_post_s"] = time.time() - t0  # kmeans/PCA compile + run
    aot_status = "off"
    if use_aot and batch == 1:
        t0 = time.time()
        aot_status = matcher.enable_aot(export_on_miss=True)
        legs["aot_s"] = time.time() - t0
    init_s = sum(legs.values())

    rng = np.random.default_rng(0)
    if batch == 1:
        imgs = [jax.device_put(rng.random((1024, 1024, 3), np.float32))
                for _ in range(3)]
        submit = matcher.test_async
    else:
        imgs = [jax.device_put(rng.random((batch, 1024, 1024, 3), np.float32))
                for _ in range(3)]
        submit = matcher.test_batch_async

    def step(img):
        out = submit(img)
        np.asarray(out["scores"])  # forces completion (tiny transfer)
        return out

    t0 = time.time()
    out = step(imgs[0])
    compile_s = time.time() - t0
    for i in range(N_WARMUP):
        step(imgs[i % len(imgs)])

    # fenced latency (one image submitted, completion fetched)
    times = []
    for i in range(N_ITERS):
        t0 = time.time()
        out = step(imgs[i % len(imgs)])
        times.append(time.time() - t0)
    lat = float(np.mean(times)) / batch

    # pipelined throughput: the runner overlaps submit/fetch 2-deep
    # (runner._run_test streams the dataset), so dispatch latency hides
    # behind device compute — this is the deployed images/sec
    # --depth=N keeps N submissions outstanding: through a remote-TPU
    # tunnel the per-step dispatch+fetch RTT is only fully hidden with
    # >= 2 in flight (on a directly-attached chip depth 1 suffices)
    t0 = time.time()
    pend = [submit(imgs[i % len(imgs)]) for i in range(depth)]
    for i in range(depth, N_ITERS):
        nxt = submit(imgs[i % len(imgs)])
        np.asarray(pend.pop(0)["scores"])
        pend.append(nxt)
    for p in pend:
        np.asarray(p["scores"])
    dt = (time.time() - t0) / N_ITERS / batch
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "COCO images/sec (SAM2-L + DINOv2-L, 10-shot test step)",
        "value": round(fps, 3),
        "unit": "img/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
    }))
    leg_str = ", ".join(f"{k} {v:.1f}" for k, v in legs.items())
    print(f"# init {init_s:.1f}s ({leg_str}), aot={aot_status}, "
          f"first-step (compile) {compile_s:.1f}s, "
          f"pipelined {1000 * dt:.0f} ms/img (depth={depth}), fenced latency "
          f"{1000 * lat:.0f} ms/img, dtype={compute_dtype}, "
          f"attention={attention_impl}, decoder={decoder_impl}, "
          f"batch={batch}, point_bs={point_bs}, quant={quant}",
          file=sys.stderr)

    if video:
        # canonical video-propagation pair (VERDICT r4 #5): recorded in the
        # same capture as the image numbers, same tunnel conditions. 3-obj
        # runs FIRST: its number is the noisier one (50-60 ms band; a 79
        # outlier was once recorded late in a crowded process, while 1-obj
        # measures 33-34 in any order) — first position keeps it closest to
        # the fresh-process standalone protocol (tools/bench_video.py)
        try:
            for objs in (3, 1):
                ms, n = _bench_video(matcher, n_frames=64, objs=objs)
                print(f"# video: {ms:.0f} ms/frame = {1000.0 / ms:.1f} fps "
                      f"({objs} obj, 1024px, {n} frames timed)",
                      file=sys.stderr)
        except Exception as e:
            print(f"# video bench failed ({type(e).__name__}: {e})",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
