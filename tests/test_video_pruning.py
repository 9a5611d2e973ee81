"""Device-memory eviction in the video predictor: tracked-frame outputs
live on device (ARCHITECTURE.md round-4 video notes), so entries beyond the
maskmem/obj-ptr lookback window are pruned — and pruning must be
semantically invisible (no future frame can ever select those slots,
reference lookback semantics sam2_base.py:563-713)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from no_time_to_train_tpu.config.presets import Sam2Config
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor

IMG = 128
T = 24


@pytest.fixture(scope="module")
def tiny_pred():
    cfg = Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=IMG, fill_hole_area=0)
    model = SAM2(cfg)
    import jax
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3)),
                        method=model.init_everything)["params"]
    return SAM2VideoPredictor(model, params)


def _propagate(pred, frames, window=None):
    state = pred.init_state(frames)
    # this test targets the per-frame path's dict pruning; the chunked-scan
    # path has its own writeback pruning covered by test_video_scan.py
    pred.scan_chunk = 0
    if window is not None:
        old, pred.history_window = pred.history_window, window
    try:
        pred.add_new_points_or_box(
            state, 0, 1, points=np.array([[40.0, 60.0]], np.float32),
            labels=np.array([1], np.int32))
        masks = {t: np.asarray(m)
                 for t, _, m in pred.propagate_in_video(state)}
    finally:
        if window is not None:
            pred.history_window = old
    return masks, state


def test_history_pruning_is_invisible(tiny_pred):
    rng = np.random.default_rng(3)
    frames = rng.random((T, IMG, IMG, 3)).astype(np.float32)
    for t in range(T):
        x0 = 16 + 2 * t
        frames[t, 40:90, x0:x0 + 50] = 0.9

    pruned_masks, pruned_state = _propagate(tiny_pred, frames)
    full_masks, full_state = _propagate(tiny_pred, frames, window=0)

    nc_pruned = pruned_state["output_dict_per_obj"][0]["non_cond"]
    nc_full = full_state["output_dict_per_obj"][0]["non_cond"]
    assert len(nc_full) == T - 1          # every tracked frame kept
    w = tiny_pred.history_window
    assert w > 0
    assert len(nc_pruned) <= w + 1        # bounded by the lookback window
    assert len(nc_pruned) < len(nc_full)  # pruning actually happened

    assert set(pruned_masks) == set(full_masks)
    for t in pruned_masks:
        np.testing.assert_allclose(pruned_masks[t], full_masks[t],
                                   atol=1e-5, rtol=1e-5, err_msg=f"frame {t}")
