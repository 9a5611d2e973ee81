"""Process-pool sharding of the per-image host finalize tail (fused native
upsample+RLE+box, pipeline.finalize_records) for multi-chip data parallelism.

At one chip (~10.7 img/s) a single host core finalizes in the compute
shadow; at a v5e-8's ~8x device rate it cannot (measured: 80 ms/img at 100
masks, 26 ms/img at a COCO-realistic 30 — tools/bench_finalize.py), so the
DP test loop shards rows of each device batch across worker PROCESSES
(RLE string building is Python/C bytes work; threads would serialize on the
GIL between native calls).

Workers are jax-free by construction: they import only utils.native
(ctypes + numpy), and the pool is spawned with the axon plugin env vars
scrubbed so a worker's interpreter startup never dials the TPU relay — the
parent process owns the single tunnel client (CLAUDE.md: one axon tunnel,
one client). Spawn (not fork): a forked child would inherit the parent's
live TPU client state.
"""
import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

_SCRUB = ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")


def _finalize_row(logits_f16, ori_h, ori_w):
    """One image's winners -> (segs, boxes). Runs inside a worker; imports
    stay inside so the parent can pickle this module-level function without
    the worker paying any jax import."""
    from no_time_to_train_tpu.utils import native
    x = np.asarray(logits_f16, np.float32)
    n = x.shape[0]
    segs, boxes = [], np.zeros((n, 4), np.float32)
    for i in range(n):
        counts, box, _ = native.finalize_mask(x[i], ori_h, ori_w)
        segs.append({"size": [int(ori_h), int(ori_w)], "counts": counts})
        boxes[i] = box
    return segs, boxes


class FinalizePool:
    """Lazy spawn-context pool over _finalize_row. Constructed only when the
    native fused finalize exists (callers check pipeline.finalize_records
    availability first)."""

    def __init__(self, procs):
        ctx = multiprocessing.get_context("spawn")
        self._ex = ProcessPoolExecutor(max_workers=procs, mp_context=ctx)
        # force worker spawn NOW, with the axon env scrubbed, so no worker
        # interpreter ever registers the TPU plugin
        saved = {k: os.environ.pop(k) for k in _SCRUB if k in os.environ}
        try:
            self._ex.submit(_finalize_row,
                            np.zeros((1, 8, 8), np.float16), 16, 16).result()
        finally:
            os.environ.update(saved)

    def submit_row(self, logits_f16, ori_h, ori_w):
        """-> Future[(segs, boxes)]. Ship only the valid prefix (fp16) —
        the pickle pipe is the sharding overhead."""
        return self._ex.submit(_finalize_row, logits_f16, ori_h, ori_w)

    def shutdown(self):
        self._ex.shutdown(wait=True)
