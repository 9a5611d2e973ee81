"""Profile the flagship test step on the TPU and print a per-op cost table.

Replaces the reference's nvidia-smi-poller-level observability (SURVEY §5)
with an XLA-trace breakdown: runs N steps under jax.profiler, parses the
device trace (plugins/profile/*/*.trace.json.gz), and aggregates op duration
by source line / fusion name.

Usage: python tools/profile_test_step.py [--steps 4] [--logdir DIR]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(logdir, top=40):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*trace.json.gz")))
    if not paths:
        print(f"no trace files under {logdir}", file=sys.stderr)
        return
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep device-lane complete events with a duration
    by_name = collections.Counter()
    by_source = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        # device ops carry hlo metadata; host/python lanes don't
        if "tf_op" not in args and "source" not in args and \
                "hlo_category" not in args:
            continue
        dur = ev["dur"]  # microseconds
        total += dur
        name = ev.get("name", "?")
        by_name[name] += dur
        calls[name] += 1
        src = args.get("source") or args.get("tf_op") or name
        by_source[src] += dur
    print(f"\n== trace {os.path.basename(os.path.dirname(path))}: "
          f"{total / 1e3:.1f} ms total device op time ==")
    print(f"\n-- top {top} by fusion/op name --")
    for name, dur in by_name.most_common(top):
        print(f"{dur / 1e3:9.2f} ms  x{calls[name]:<4d} {name[:110]}")
    print(f"\n-- top {top} by source --")
    for src, dur in by_source.most_common(top):
        print(f"{dur / 1e3:9.2f} ms  {src[:120]}")
    return by_name, by_source


def parse_trace_joint(logdir, top=60, steps=1):
    """Per-(fusion name, source line) table with per-step durations — the
    view that pinpoints WHICH op at a shared source line is slow (e.g. the
    encoder gelu-in-GEMM-prologue find: 40 uniform add_add_fusions at one
    flax Dense line)."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*trace.json.gz")))
    if not paths:
        print(f"no trace files under {logdir}", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    cnt = collections.Counter()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        if "tf_op" not in args and "source" not in args and \
                "hlo_category" not in args:
            continue
        src = args.get("source") or args.get("tf_op") or ""
        cnt[(ev.get("name", "?"), src)] += ev["dur"]
    print(f"\n-- top {top} by (name, source), ms/step over {steps} --")
    for (name, src), dur in cnt.most_common(top):
        print(f"{dur / 1e3 / steps:8.3f}  {name[:36]:36s} {src[:80]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/nttt_trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--joint", action="store_true",
                    help="also print the per-(name, source) table")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--attention-impl", default="pallas",
                    choices=("pallas", "xla"))
    ap.add_argument("--batch", type=int, default=1,
                    help="profile the vmapped B-image step (test_batch_async)")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.logdir, args.top)
        if args.joint:
            parse_trace_joint(args.logdir, args.top, args.steps)
        return

    from no_time_to_train_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from no_time_to_train_tpu.models.matching.pipeline import (
        NoAMGMatcher, MatchingConfig)
    from no_time_to_train_tpu.models.matching import memory_bank as mb

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    matcher = NoAMGMatcher("sam2_hiera_l.yaml", "dinov2_large",
                           MatchingConfig(compute_dtype=dtype,
                                          attention_impl=args.attention_impl),
                           n_classes=20, memory_length=10)
    matcher.bank = mb.postprocess(matcher.bank)
    rng = np.random.default_rng(0)
    if args.batch > 1:
        img = jax.device_put(rng.random((args.batch, 1024, 1024, 3),
                                        np.float32))
        submit = matcher.test_batch_async
    else:
        img = jax.device_put(rng.random((1024, 1024, 3), np.float32))
        submit = matcher.test_async

    def step():
        out = submit(img)
        np.asarray(out["scores"])

    t0 = time.time()
    step()
    print(f"compile+first step {time.time() - t0:.1f}s", file=sys.stderr)
    step()

    jax.profiler.start_trace(args.logdir)
    t0 = time.time()
    for _ in range(args.steps):
        step()
    dt = (time.time() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"fenced {dt * 1e3:.0f} ms/img over {args.steps} steps",
          file=sys.stderr)
    parse_trace(args.logdir, args.top)
    if args.joint:
        parse_trace_joint(args.logdir, args.top, args.steps)


if __name__ == "__main__":
    main()
