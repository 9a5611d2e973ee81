"""Matcher-AMG variant (reference matcher_utils.py:62-309): select-prompt
generation, dense_pred mode, extra_mask_data NMS competition."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from no_time_to_train_tpu.config.presets import Sam2Config
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.matching.pipeline import _random_params_like

TINY = Sam2Config(
    embed_dim=32, num_heads=1, stages=(1, 1, 1, 1), global_att_blocks=(2,),
    window_pos_embed_bkg_spatial_size=(2, 2), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(256, 128, 64, 32), image_size=128)


@pytest.fixture(scope="module")
def tiny_matcher_amg():
    from no_time_to_train_tpu.models.matching.matcher_amg import (
        SAM2AutomaticMaskGeneratorMatcher)
    model = SAM2(TINY)
    params = _random_params_like(
        lambda k: model.init(k, jnp.zeros((1, 128, 128, 3)),
                             method=model.init_everything),
        jax.random.PRNGKey(0), 0)
    params = jax.tree.map(jnp.asarray, params)
    return SAM2AutomaticMaskGeneratorMatcher(
        model, params, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0)


def test_select_points(tiny_matcher_amg, rng):
    img = rng.random((64, 80, 3)).astype(np.float32)
    masks, ious = tiny_matcher_amg.generate(
        img,
        select_point_coords=[np.array([[20.0, 30.0], [60.0, 10.0]]),
                             np.array([[40.0, 40.0]])],
        select_point_labels=[np.array([1, 1]), np.array([1])])
    assert masks.ndim == 3 and masks.shape[1:] == (64, 80)
    assert masks.dtype == bool
    assert len(ious) == len(masks)


def test_select_points_with_box(tiny_matcher_amg, rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    masks, ious = tiny_matcher_amg.generate(
        img,
        select_point_coords=[np.array([[32.0, 32.0]])],
        select_point_labels=[np.array([1])],
        select_box=[np.array([8.0, 8.0, 56.0, 56.0])])
    assert masks.shape[1:] == (64, 64)
    assert len(ious) == len(masks)


def test_box_equals_prompt_encoder_box_path(tiny_matcher_amg):
    """A box fed as corner points with labels 2/3 (pad=False) must produce
    the identical sparse embedding as the prompt encoder's boxes argument."""
    model = tiny_matcher_amg.model
    params = tiny_matcher_amg.params
    box = jnp.asarray([[10.0, 12.0, 50.0, 60.0]])

    def run_boxes(p):
        sparse, _ = model.apply(
            {"params": p}, boxes=box,
            method=lambda m, boxes: m.sam_prompt_encoder(boxes=boxes))
        return sparse

    def run_points(p):
        coords = box.reshape(1, 2, 2)
        labels = jnp.asarray([[2, 3]], jnp.int32)
        return model.apply(
            {"params": p},
            method=lambda m: m.sam_prompt_encoder._embed_points(
                coords, labels, pad=False))

    got_b = np.asarray(run_boxes(params))
    got_p = np.asarray(run_points(params))
    np.testing.assert_allclose(got_p, got_b, rtol=1e-6, atol=1e-6)


def test_dense_pred(tiny_matcher_amg, rng):
    img = rng.random((48, 48, 3)).astype(np.float32)
    data = tiny_matcher_amg.generate(img, dense_pred=True)
    assert set(data) >= {"masks", "iou_preds", "stability_score", "boxes",
                         "points"}
    n = len(data["iou_preds"])
    assert data["masks"].shape == (n, 48, 48)
    assert data["boxes"].shape == (n, 4)
    # 4x4 grid, 3 multimask channels, no NMS: all candidates survive with
    # thresholds at 0
    assert n == 16 * 3


def test_extra_mask_data_competes_in_nms(tiny_matcher_amg, rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    base_masks, base_ious = tiny_matcher_amg.generate(
        img,
        select_point_coords=[np.array([[32.0, 32.0]])],
        select_point_labels=[np.array([1])])
    # an extra candidate covering everything with an unbeatable score
    # suppresses overlapping own candidates
    extra = {
        "masks": np.ones((1, 64, 64), bool),
        "iou_preds": np.array([10.0], np.float32),
        "boxes": np.array([[0.0, 0.0, 64.0, 64.0]], np.float32),
    }
    masks, ious = tiny_matcher_amg.generate(
        img,
        select_point_coords=[np.array([[32.0, 32.0]])],
        select_point_labels=[np.array([1])],
        extra_mask_data=extra)
    assert 10.0 in list(ious)           # the extra candidate survives
    assert len(masks) <= len(base_masks) + 1


def test_select_mask_input_unimplemented(tiny_matcher_amg, rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    with pytest.raises(NotImplementedError):
        tiny_matcher_amg.generate(
            img, select_point_coords=[np.zeros((1, 2))],
            select_point_labels=[np.ones(1)],
            select_mask_input=[np.zeros((1, 32, 32))])
