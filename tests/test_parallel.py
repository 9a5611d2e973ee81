"""Multi-device data parallelism on the virtual CPU mesh: distributed fill
(all_gather) equals sequential fill; batched test runs per-device; result
interleaving matches the reference's rank merge."""
import numpy as np
import pytest
import jax

from conftest import cpu_devices
from no_time_to_train_tpu.config.presets import Sam2Config, EncoderConfig
from no_time_to_train_tpu.models.matching.pipeline import (NoAMGMatcher,
                                                           MatchingConfig)
from no_time_to_train_tpu.parallel.mesh import (make_mesh,
                                                make_data_parallel_fill,
                                                make_data_parallel_test,
                                                interleave_results)

TINY_SAM = Sam2Config(
    embed_dim=32, num_heads=1, stages=(1, 1, 1, 1), global_att_blocks=(2,),
    window_pos_embed_bkg_spatial_size=(2, 2), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), image_size=128)
TINY_ENC = EncoderConfig("tiny", 28, 14, 32, 1, 2, "local")
MCFG = MatchingConfig(points_per_side=4, testing_point_bs=8, iou_thr=0.0,
                      nms_thr=0.5, num_out_instance=5, analysis_res=128,
                      expand_ratio=2)


@pytest.fixture(scope="module")
def mesh():
    devs = cpu_devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    return make_mesh(devs[:4])


def test_distributed_fill_matches_sequential(mesh, rng):
    m1 = NoAMGMatcher(TINY_SAM, TINY_ENC, MCFG, n_classes=2, memory_length=2)
    m2 = NoAMGMatcher(TINY_SAM, TINY_ENC, MCFG, n_classes=2, memory_length=2,
                      sam2_params=jax.tree.map(np.asarray, m1.sam2_params),
                      dino_params=jax.tree.map(np.asarray, m1.dino_params))
    cats = np.array([0, 0, 1, 1])
    imgs = rng.random((4, 64, 64, 3)).astype(np.float32)
    masks = (rng.random((4, 64, 64)) > 0.5).astype(np.float32)

    fill = make_data_parallel_fill(m1, mesh)
    fill(cats, imgs, masks)

    m2.fill_memory(imgs, masks, cats)

    np.testing.assert_array_equal(np.asarray(m1.bank.fill_counts),
                                  np.asarray(m2.bank.fill_counts))
    np.testing.assert_allclose(np.asarray(m1.bank.feats),
                               np.asarray(m2.bank.feats), atol=1e-5,
                               rtol=1e-5)


def test_distributed_fill_negative_and_padded_tail(mesh, rng):
    """DP fill routes to the NEGATIVE bank with positive=False, and a padded
    tail batch (n_valid < mesh size) leaves the bank byte-identical to the
    sequential fill of only the valid items (VERDICT r2 #3b)."""
    mcfg_neg = MatchingConfig(points_per_side=4, testing_point_bs=8,
                              iou_thr=0.0, nms_thr=0.5, num_out_instance=5,
                              analysis_res=128, expand_ratio=2,
                              with_negative_refs=True)
    m1 = NoAMGMatcher(TINY_SAM, TINY_ENC, mcfg_neg, n_classes=2,
                      memory_length=2)
    m2 = NoAMGMatcher(TINY_SAM, TINY_ENC, mcfg_neg, n_classes=2,
                      memory_length=2,
                      sam2_params=jax.tree.map(np.asarray, m1.sam2_params),
                      dino_params=jax.tree.map(np.asarray, m1.dino_params))
    cats = np.array([0, 1, 1, 1])  # last entry is PAD (repeat of index 2)
    imgs = rng.random((4, 64, 64, 3)).astype(np.float32)
    masks = (rng.random((4, 64, 64)) > 0.5).astype(np.float32)
    imgs[3], masks[3] = imgs[2], masks[2]

    fill_neg = make_data_parallel_fill(m1, mesh, positive=False)
    fill_neg(cats, imgs, masks, n_valid=3)

    m2.fill_memory(imgs[:3], masks[:3], cats[:3], positive=False)

    # positive bank untouched, negative identical to the 3-item sequential
    assert int(np.asarray(m1.bank.fill_counts).sum()) == 0
    np.testing.assert_array_equal(np.asarray(m1.bank_neg.fill_counts),
                                  np.asarray(m2.bank_neg.fill_counts))
    assert int(np.asarray(m1.bank_neg.fill_counts).sum()) == 3
    np.testing.assert_allclose(np.asarray(m1.bank_neg.feats),
                               np.asarray(m2.bank_neg.feats), atol=1e-5,
                               rtol=1e-5)


def test_data_parallel_test_matches_single(mesh, rng):
    m = NoAMGMatcher(TINY_SAM, TINY_ENC, MCFG, n_classes=2, memory_length=2)
    m.fill_memory(rng.random((2, 64, 64, 3)).astype(np.float32),
                  (rng.random((2, 64, 64)) > 0.5).astype(np.float32), [0, 1])
    m.postprocess_memory()

    imgs = rng.random((4, 128, 128, 3)).astype(np.float32)
    run = make_data_parallel_test(m, mesh)
    batched = jax.tree.map(np.asarray, run(imgs))

    single0 = m.test(imgs[0])
    np.testing.assert_allclose(batched["scores"][0], single0["scores"],
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_array_equal(batched["labels"][0], single0["labels"])


def test_interleave_results():
    # the reference deals items round-robin to ranks, merges by zip, truncates
    per_rank = [[0, 3, 6], [1, 4, 7], [2, 5, 8]]
    assert interleave_results(per_rank, 8) == [0, 1, 2, 3, 4, 5, 6, 7]


def test_process_shard_indices_small_dataset():
    """Fewer items than processes: the pad must REPEAT the index list
    (torch DistributedSampler semantics) so no rank gets an empty shard —
    an empty part file would truncate the rank-0 interleave to zero."""
    from no_time_to_train_tpu.parallel.multihost import (
        process_shard_indices, rank_real_count)
    n_items, world = 3, 8
    shards = [process_shard_indices(n_items, world, r) for r in range(world)]
    assert all(len(s) == 1 for s in shards)  # equal step count, none empty
    merged = interleave_results(shards, n_items)
    assert merged == [0, 1, 2]
    assert [rank_real_count(n_items, world, r) for r in range(world)] == \
        [1, 1, 1, 0, 0, 0, 0, 0]
    # normal case unchanged
    shards = [process_shard_indices(10, 4, r) for r in range(4)]
    assert interleave_results(shards, 10) == list(range(10))
    assert [rank_real_count(10, 4, r) for r in range(4)] == [3, 3, 2, 2]
    assert all(len(s) == 3 for s in shards)


def test_multihost_gather_payload(tmp_path):
    """save_rank_results/collect_results round-trip the analysis rows so
    rank 0 writes merged scalars/triplets pkls (per-rank writes raced)."""
    from no_time_to_train_tpu.parallel.multihost import (
        save_rank_results, collect_results)
    d = str(tmp_path)
    save_rank_results(d, 0, [[0], [2]], scalars=["s0"], triplets=["t0"])
    save_rank_results(d, 1, [[1], [3]], scalars=["s1"], triplets=[])
    results, scalars, triplets = collect_results(d, 2, 4, timeout_s=5)
    assert results == [[0], [1], [2], [3]]
    assert scalars == ["s0", "s1"] and triplets == ["t0"]
