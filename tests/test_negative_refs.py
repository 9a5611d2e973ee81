"""Negative-reference flow: fill_memory_neg -> postprocess both banks ->
test with negative suppression (reference data modes fill_memory_neg /
test_support, Sam2MatchingBaseline_noAMG.py:726-763)."""
import numpy as np
import pytest

from no_time_to_train_tpu.config.presets import Sam2Config, EncoderConfig
from no_time_to_train_tpu.models.matching.pipeline import (NoAMGMatcher,
                                                           MatchingConfig)

TINY_SAM = Sam2Config(
    embed_dim=32, num_heads=1, stages=(1, 1, 1, 1), global_att_blocks=(2,),
    window_pos_embed_bkg_spatial_size=(2, 2), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), image_size=128)
TINY_ENC = EncoderConfig("tiny", 28, 14, 32, 1, 2, "local")


def test_negative_flow(rng):
    mcfg = MatchingConfig(points_per_side=4, testing_point_bs=8, iou_thr=0.0,
                          nms_thr=0.5, num_out_instance=5, analysis_res=128,
                          expand_ratio=2, with_negative_refs=True)
    m = NoAMGMatcher(TINY_SAM, TINY_ENC, mcfg, n_classes=2, memory_length=2)
    assert m.bank_neg is not None

    for c in range(2):
        imgs = rng.random((2, 64, 64, 3)).astype(np.float32)
        msks = (rng.random((2, 64, 64)) > 0.4).astype(np.float32)
        m.fill_memory(imgs, msks, [c, c], positive=True)
        m.fill_memory(rng.random((2, 64, 64, 3)).astype(np.float32),
                      (rng.random((2, 64, 64)) > 0.4).astype(np.float32),
                      [c, c], positive=False)
    assert int(np.asarray(m.bank.fill_counts).sum()) == 4
    assert int(np.asarray(m.bank_neg.fill_counts).sum()) == 4

    m.postprocess_memory(positive=True)
    m.postprocess_memory(positive=False)
    assert bool(m.bank.postprocessed) and bool(m.bank_neg.postprocessed)

    out = m.test(rng.random((128, 128, 3)).astype(np.float32))
    assert out["scores"].shape == (5,)
    # negative suppression must keep scores in [0, 1] (clipped cosine * exp<=1)
    v = out["scores"][out["valid"]]
    assert np.all(v >= 0) and np.all(v <= 1.0 + 1e-5)
