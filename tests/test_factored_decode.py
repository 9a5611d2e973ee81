"""Factored grid decoder == dense MaskDecoder.predict_best_of_multimask.

The factored path (models/sam2/factored_decode.py) re-associates the same
math, so fp32 agreement should be ~1e-4 on mask logits and IoU scores."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from no_time_to_train_tpu.models.sam2.mask_decoder import MaskDecoder
from no_time_to_train_tpu.models.sam2.factored_decode import (
    factored_best_of_multimask)


def _randn(rng, *shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape, np.float32) * scale)


@pytest.mark.parametrize("pred_obj_scores,use_hr,sigmoid",
                         [(True, True, True), (False, False, False)])
def test_factored_matches_dense(pred_obj_scores, use_hr, sigmoid):
    rng = np.random.default_rng(0)
    c, h, w, p, ts = 64, 8, 8, 5, 2
    dec = MaskDecoder(transformer_dim=c, use_high_res_features=use_hr,
                      pred_obj_scores=pred_obj_scores,
                      pred_obj_scores_mlp=pred_obj_scores,
                      iou_prediction_use_sigmoid=sigmoid,
                      transformer_num_heads=4, transformer_mlp_dim=128)

    img = _randn(rng, 1, h, w, c, scale=0.5)
    pe = _randn(rng, h, w, c, scale=0.5)
    sparse = _randn(rng, p, ts, c, scale=0.5)
    dense1 = _randn(rng, 1, h, w, c, scale=0.5)
    hr = ([_randn(rng, 1, 4 * h, 4 * w, c // 8, scale=0.5),
           _randn(rng, 1, 2 * h, 2 * w, c // 4, scale=0.5)]
          if use_hr else None)

    variables = dec.init(jax.random.PRNGKey(0), img, pe, sparse, dense1,
                         repeat_image=False, high_res_features=hr,
                         multimask_output=True)
    # noise instead of flax init for nontrivial LN/bias behavior
    leaves, treedef = jax.tree.flatten(variables["params"])
    noisy = [
        _randn(rng, *l.shape, scale=0.3) + (1.0 if l.ndim == 1 else 0.0)
        for l in leaves]
    params = jax.tree.unflatten(treedef, noisy)

    mask_d, iou_d = dec.apply(
        {"params": params}, img, pe, sparse, dense1, repeat_image=False,
        high_res_features=hr, method=dec.predict_best_of_multimask)
    mask_f, iou_f = factored_best_of_multimask(
        params, img, pe, sparse, dense1, hr, num_heads=4,
        pred_obj_scores=pred_obj_scores, iou_use_sigmoid=sigmoid)

    assert mask_f.shape == mask_d.shape == (p, 4 * h, 4 * w)
    np.testing.assert_allclose(np.asarray(iou_f), np.asarray(iou_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mask_f), np.asarray(mask_d),
                               rtol=2e-3, atol=2e-3)


def test_pipeline_factored_matches_dense():
    """The pipeline's factored decode branch == dense branch end-to-end."""
    import dataclasses
    from no_time_to_train_tpu.config.presets import Sam2Config, EncoderConfig
    from no_time_to_train_tpu.models.matching.pipeline import (NoAMGMatcher,
                                                               MatchingConfig)
    sam_cfg = Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=128)
    enc_cfg = EncoderConfig("tiny", 28, 14, 32, 1, 2, "local")
    mcfg = MatchingConfig(points_per_side=4, testing_point_bs=8, iou_thr=0.0,
                          nms_thr=0.5, num_out_instance=5, analysis_res=128,
                          expand_ratio=2, decoder_impl="factored")
    m = NoAMGMatcher(sam_cfg, enc_cfg, mcfg, n_classes=3, memory_length=2)
    img = jnp.asarray(np.random.default_rng(0).random((128, 128, 3),
                                                      np.float32))
    lr_f, iou_f, _ = m._decode_grid(m.sam2_params, img)
    m.matching = dataclasses.replace(m.matching, decoder_impl="dense")
    lr_d, iou_d, _ = m._decode_grid(m.sam2_params, img)
    np.testing.assert_allclose(np.asarray(iou_f), np.asarray(iou_d),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lr_f), np.asarray(lr_d),
                               rtol=2e-3, atol=2e-3)
