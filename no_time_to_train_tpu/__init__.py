"""no_time_to_train_tpu — a TPU-native JAX/XLA/Pallas rebuild of the
"No Time to Train" (NTTT) training-free few-shot instance segmentation framework.

Reference: DogRog/no-time-to-train (arXiv 2507.02798). This package is a
from-scratch TPU-first re-design, not a port: the compute path is JAX
(jit/vmap/shard_map + Pallas kernels), images are NHWC, all shapes are static
(pad + validity masks), and the grid-point decode that the reference runs as a
serial microbatch loop is a single jitted batched decode.

Layout:
  config/    experiment + model topology presets (YAML-compatible surface)
  models/    SAM2 (Hiera/FPN/prompt-encoder/mask-decoder/memory) and DINOv2 in flax,
             plus the matching stack (memory bank, scoring, pipeline)
  ops/       TPU ops: torch-parity resize, NMS, mask utils, flash attention,
             connected components, k-means, PCA
  parallel/  mesh construction + data-parallel sharding helpers
  data/      COCO/LVIS datasets, few-shot sampling, RLE + eval (no pycocotools dep)
  utils/     torch checkpoint conversion, timing/FPS harness
"""

__version__ = "0.1.0"
