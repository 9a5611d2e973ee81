#!/usr/bin/env python
"""Export / cold-load the AOT-compiled flagship test step (VERDICT r2 #5).

  python tools/aot_flagship.py export          # compile once, serialize
  python tools/aot_flagship.py run             # fresh-process cold start:
                                               # load executable, one step,
                                               # prints timing breakdown

`run` disables the persistent XLA compilation cache (points it at an empty
tmp dir) so the measured cold start is honest: deserialization replaces BOTH
the cold ~6 min compile and the ~100 s warm-cache compile.
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_matcher():
    from no_time_to_train_tpu.models.matching.pipeline import (
        NoAMGMatcher, MatchingConfig)
    import jax
    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    # NO bank postprocess here: it would jit-compile the kmeans/PCA program
    # (minutes against an empty cache) and bank VALUES don't change the
    # exported step's compilation — same convention as __graft_entry__.
    return NoAMGMatcher("sam2_hiera_l.yaml", "dinov2_large",
                        MatchingConfig(compute_dtype=dtype),
                        n_classes=20, memory_length=10)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    from no_time_to_train_tpu.utils import aot
    path = aot.DEFAULT_PATH

    if mode == "export":
        from no_time_to_train_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        matcher = build_matcher()
        t0 = time.time()
        # matcher.enable_aot folds the matcher config into the fingerprint —
        # the same call bench.py/runner.py load through
        status = matcher.enable_aot(path, export_on_miss=True)
        print(f"{status}: compiled step -> {path} "
              f"({os.path.getsize(path) / 1e6:.0f} MB, "
              f"{time.time() - t0:.0f}s)")
        return

    # ---- cold-start run: empty compilation cache, load the executable ----
    t_start = time.time()
    os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
        prefix="empty_xla_cache_")
    import jax

    t0 = time.time()
    matcher = build_matcher()   # params on device (no jit compilation)
    init_s = time.time() - t0

    t0 = time.time()
    status = matcher.enable_aot(path)
    load_s = time.time() - t0
    if status != "loaded":
        print("no matching AOT artifact; run `export` first")
        sys.exit(1)

    img = jax.device_put(np.random.default_rng(0).random(
        (1024, 1024, 3), np.float32))
    t0 = time.time()
    out = matcher.test_async(img)
    np.asarray(out["scores"])
    first_s = time.time() - t0
    t0 = time.time()
    for _ in range(4):
        out = matcher.test_async(img)
        np.asarray(out["scores"])
    steady = (time.time() - t0) / 4
    total = time.time() - t_start
    print(f"cold start with AOT artifact: total {total:.1f}s "
          f"(exec load {load_s:.1f}s, matcher init {init_s:.1f}s, "
          f"first step {first_s:.1f}s, steady {steady * 1e3:.0f} ms/img)")


if __name__ == "__main__":
    main()
