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

    run.jfn = jfn  # exposed for AOT pre-compilation (multi-process barriers)
    return run


def make_data_parallel_fill(matcher, mesh, positive=True):
    """Returns fn(cat_inds [B], imgs [B, H, W, 3], masks [B, Hm, Wm],
    n_valid=None) that extracts features on each device and all-gathers them
    so every host applies the same sequential bank update (reference
    concat_all_gather + rank-loop semantics, model_utils.py:74-91) — to the
    positive or the negative bank.

    `n_valid < B` drops the padded tail of the LAST batch after the gather
    (the padded entries never reach the bank, so the final state is
    byte-identical to the single-device sequential fill)."""
    n = mesh.devices.size

    def per_device(dino_params, cats, imgs, msks):
        feats, m = matcher._fill_features(dino_params, imgs, msks)
        g = partial(jax.lax.all_gather, axis_name="data", tiled=True)
        return g(cats), g(feats), g(m)

    fn = shard_map(per_device, mesh,
                   in_specs=(P(), P("data"), P("data"), P("data")),
                   out_specs=(P(), P(), P()), check_vma=False)
    jfn = jax.jit(fn)

    def run(cat_inds, imgs, masks, n_valid=None):
        assert imgs.shape[0] == n, imgs.shape
        cats, feats, msks = jfn(
            matcher.dino_params,
            cat_inds if isinstance(cat_inds, jax.Array)
            else jnp.asarray(cat_inds, jnp.int32),
            imgs if isinstance(imgs, jax.Array) else jnp.asarray(imgs),
            masks if isinstance(masks, jax.Array) else jnp.asarray(masks))
        if n_valid is not None and n_valid < n:
            cats, feats, msks = cats[:n_valid], feats[:n_valid], \
                msks[:n_valid]
        from no_time_to_train_tpu.models.matching import memory_bank as mb
        target = matcher.bank if positive else matcher.bank_neg
        updated = mb.fill(target, cats, feats, msks)
        max_count = int(np.asarray(updated.fill_counts).max())
        if max_count > updated.feats.shape[1]:  # same fail-loud as fill_memory
            raise IndexError(
                f"memory bank overflow: a class received {max_count} "
                f"references but memory_length={updated.feats.shape[1]}")
        if positive:
            matcher.bank = updated
        else:
            matcher.bank_neg = updated
        return updated

    run.jfn = jfn  # exposed for AOT pre-compilation (multi-process barriers)
    return run


def make_global_array(mesh, data, axis="data"):
    """Build a batch-sharded GLOBAL jax.Array over a (possibly multi-process)
    mesh from host-replicated numpy data.

    Every process passes the SAME full [B, ...] array; each donates exactly
    the rows its local devices own (`jax.make_array_from_single_device_arrays`
    composes them into one global array). On a single-process mesh this is
    equivalent to `jax.device_put(data, NamedSharding(mesh, P(axis)))`; on a
    multi-process mesh it is the only way to feed `shard_map` inputs without
    a host-side scatter (reference: each DDP rank loads its own shard,
    run_lightning.py:23-78)."""
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, P(axis))
    devs = list(mesh.devices.ravel())
    per = data.shape[0] // len(devs)
    assert per * len(devs) == data.shape[0], (data.shape, len(devs))
    # ask the mesh devices' own client for this process's index —
    # jax.process_index() consults the DEFAULT backend, which can be a
    # different platform (e.g. a single-process TPU next to a multi-process
    # CPU mesh) and then reports 0 on every rank
    my_proc = devs[0].client.process_index()
    shards = [jax.device_put(data[pos * per:(pos + 1) * per], d)
              for pos, d in enumerate(devs)
              if d.process_index == my_proc]
    return jax.make_array_from_single_device_arrays(data.shape, sharding,
                                                    shards)


def interleave_results(per_rank_results, total):
    """Reproduce the reference's interleaved rank merge + pad truncation
    (run_lightning.py:71-75): results were dealt round-robin to ranks, so
    zip them back and cut to dataset size."""
    merged = []
    for group in zip(*per_rank_results):
        merged.extend(group)
    return merged[:total]
