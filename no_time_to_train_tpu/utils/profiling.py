"""Tracing / profiling utilities.

The reference's observability is wall-clock-only (synchronized per-image
timers + an nvidia-smi poller, SURVEY §5). Here:
  - `Timer`: completion-fenced per-step timing with the same aggregate report
    format as the reference FPS harness (run_lightning.py:152-161);
  - `trace`: context manager around jax.profiler for XLA-level traces
    (view with TensorBoard / xprof);
  - `device_memory_stats`: accelerator memory snapshot (the nvidia-smi
    replacement, scripts/run_nttt_eval.sh:26-60).
"""
import contextlib
import time

import numpy as np


class Timer:
    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, sync=None):
        """Time one step; `sync` is an optional callable forcing device
        completion (e.g. lambda: np.asarray(out['scores']))."""
        t0 = time.time()
        yield
        if sync is not None:
            sync()
        self.times.append(time.time() - t0)

    def report(self, header="[Validation] Inference Time Benchmark:"):
        t = np.asarray(self.times)
        print(f"\n{header}")
        print(f"  Total images: {len(t)}")
        print(f"  Total time: {t.sum():.4f} s")
        print(f"  Average time per image: {t.mean():.4f} s")
        print(f"  FPS: {1.0 / t.mean():.2f}")
        return {"total": float(t.sum()), "mean": float(t.mean()),
                "fps": float(1.0 / t.mean())}


@contextlib.contextmanager
def trace(logdir="/tmp/nttt_trace"):
    import jax
    try:
        jax.profiler.start_trace(logdir)
        yield logdir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def device_memory_stats(device=None):
    import jax
    d = device or jax.devices()[0]
    try:
        s = d.memory_stats()
        return {"bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit")}
    except Exception:
        return {}
