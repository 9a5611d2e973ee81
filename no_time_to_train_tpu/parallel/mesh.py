"""Device mesh + data-parallel execution.

Replaces the reference's Lightning-DDP + NCCL layer (SURVEY §2.5): the
reference shards the eval image stream across ranks with a padded
DistributedSampler and all-gathers reference features during fill_memory
(no_time_to_train/models/model_utils.py:74-91). Here:

  - a 1-D `data` mesh over all local (or virtual) devices;
  - `pmap`-free shard_map data parallelism: each device runs the single-image
    test step; results come back batch-sharded;
  - fill_memory gathers per-device reference features with
    `jax.lax.all_gather` over ICI, and every host applies the identical
    sequential bank update (matching the reference's gather-then-loop
    semantics, Sam2MatchingBaseline_noAMG.py:471-485).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.5
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, mesh, in_specs, out_specs, **kw):
    try:
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, **kw)
    except TypeError:  # older jax without check_vma
        kw.pop("check_vma", None)
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, **kw)


def make_mesh(devices=None, axis="data"):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def make_data_parallel_test(matcher, mesh):
    """Returns a jitted fn(imgs [B, S, S, 3]) -> batched result dict with B =
    mesh size, inputs/outputs sharded over the data axis, params and memory
    bank replicated.

    Params and the bank travel as ARGUMENTS of the jitted shard_map fn
    (replicated specs), mirroring matcher._test_jit: closing over them would
    bake the 1-2GB trees into the program as constants and freeze the bank at
    first trace (stale results after a later fill/postprocess/load_ckpt)."""
    n = mesh.devices.size

    def per_device(sam2_params, dino_params, bank, bank_neg, img_shard):
        out = matcher._test_impl(sam2_params, dino_params, bank, bank_neg,
                                 img_shard[0],
                                 with_negative=matcher.matching.with_negative_refs)
        return jax.tree.map(lambda x: x[None], out)

    # check_vma=False: pallas_call (the decode kernels on TPU) does not
    # declare varying-mesh-axes metadata, and the newer-jax default
    # check_vma=True rejects it inside shard_map
    # (tests/test_decoder_attention.py::test_fused_kernels_under_shard_map_tpu)
    fn = shard_map(per_device, mesh,
                   in_specs=(P(), P(), P(), P(), P("data")),
                   out_specs=P("data"), check_vma=False)
    jfn = jax.jit(fn)

    def run(imgs):
        assert imgs.shape[0] == n, f"batch {imgs.shape[0]} != mesh size {n}"
        bank_neg = (matcher.bank_neg if matcher.bank_neg is not None
                    else matcher.bank)
        return jfn(matcher.sam2_params, matcher.dino_params, matcher.bank,
                   bank_neg, imgs)

    return run


def make_data_parallel_fill(matcher, mesh):
    """Returns fn(cat_inds [B], imgs [B, H, W, 3], masks [B, Hm, Wm]) that
    extracts features on each device and all-gathers them so every host can
    apply the same bank update."""
    n = mesh.devices.size

    def per_device(dino_params, cats, imgs, msks):
        feats, m = matcher._fill_features(dino_params, imgs, msks)
        g = partial(jax.lax.all_gather, axis_name="data", tiled=True)
        return g(cats), g(feats), g(m)

    fn = shard_map(per_device, mesh,
                   in_specs=(P(), P("data"), P("data"), P("data")),
                   out_specs=(P(), P(), P()), check_vma=False)
    jfn = jax.jit(fn)

    def run(cat_inds, imgs, masks):
        assert imgs.shape[0] == n
        cats, feats, msks = jfn(matcher.dino_params,
                                jnp.asarray(cat_inds, jnp.int32),
                                jnp.asarray(imgs), jnp.asarray(masks))
        from no_time_to_train_tpu.models.matching import memory_bank as mb
        matcher.bank = mb.fill(matcher.bank, cats, feats, msks)
        return matcher.bank

    return run


def interleave_results(per_rank_results, total):
    """Reproduce the reference's interleaved rank merge + pad truncation
    (run_lightning.py:71-75): results were dealt round-robin to ranks, so
    zip them back and cut to dataset size."""
    merged = []
    for group in zip(*per_rank_results):
        merged.extend(group)
    return merged[:total]
