"""Chunked-scan video tracking must match the per-frame fused path.

The scan program (models/sam2/video.py:_scan_impl) re-derives the reference's
memory-selection index arithmetic (sam2_base.py:563-713) inside a lax.scan
carry ring instead of the host dict, so its outputs must agree with the
step-wise path on every frame — including strided memory selection, multiple
conditioning frames (run splitting + pointer pools), multi-object batches,
reverse propagation, and the per-frame tail after the last full chunk.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from no_time_to_train_tpu.config.presets import Sam2Config
from no_time_to_train_tpu.models.sam2.model import SAM2
from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor

IMG = 128


def _tiny_cfg(**kw):
    return Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=IMG, **kw)


def _make_pred(cfg):
    model = SAM2(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3)),
                        method=model.init_everything)["params"]
    return SAM2VideoPredictor(model, params)


def _frames(T, seed=3):
    rng = np.random.default_rng(seed)
    frames = rng.random((T, IMG, IMG, 3)).astype(np.float32)
    for t in range(T):
        x0 = 10 + 3 * t
        frames[t, 40:90, x0:x0 + 40] = 0.9
        frames[t, 20:50, 80:115] = 0.1
    return frames


def _propagate(pred, frames, prompts, scan_chunk, reverse=False,
               start=None):
    """prompts: list of (frame_idx, obj_id, point_xy)."""
    state = pred.init_state(frames)
    pred.scan_chunk = scan_chunk
    for fidx, obj, pt in prompts:
        pred.add_new_points_or_box(
            state, fidx, obj, points=np.array([pt], np.float32),
            labels=np.array([1], np.int32))
    masks = {t: np.asarray(m)
             for t, _, m in pred.propagate_in_video(
                 state, start_frame_idx=start, reverse=reverse)}
    return masks, state


def _assert_close(a, b, label):
    assert set(a) == set(b)
    for t in sorted(a):
        np.testing.assert_allclose(
            a[t], b[t], atol=5e-4, rtol=1e-3,
            err_msg=f"{label}: frame {t}")


def test_scan_matches_stepwise_multiobj():
    """Two objects, two conditioning frames (run splitting, cond rows and
    cond pointer pools > 1), chunk 4 with a per-frame tail."""
    cfg = _tiny_cfg(fill_hole_area=8)
    pred = _make_pred(cfg)
    frames = _frames(18)
    prompts = [(0, 1, [30.0, 60.0]), (0, 2, [95.0, 30.0]),
               (9, 1, [55.0, 60.0]), (9, 2, [95.0, 30.0])]
    ref, ref_state = _propagate(pred, frames, prompts, scan_chunk=0)
    got, got_state = _propagate(pred, frames, prompts, scan_chunk=4)
    _assert_close(got, ref, "multiobj")
    # writeback parity: the scan path leaves the same non_cond keys (within
    # the pruning window) as the per-frame path
    for o in range(2):
        assert (set(got_state["output_dict_per_obj"][o]["non_cond"])
                == set(ref_state["output_dict_per_obj"][o]["non_cond"]))


def test_scan_matches_stepwise_strided_reverse():
    """Temporal stride 2 (strided maskmem row arithmetic) and a reverse pass
    from the last frame."""
    cfg = _tiny_cfg(fill_hole_area=0, memory_temporal_stride_for_eval=2)
    pred = _make_pred(cfg)
    frames = _frames(14, seed=5)
    prompts = [(13, 1, [70.0, 60.0])]
    ref, _ = _propagate(pred, frames, prompts, scan_chunk=0,
                        reverse=True, start=13)
    got, _ = _propagate(pred, frames, prompts, scan_chunk=4,
                        reverse=True, start=13)
    _assert_close(got, ref, "strided-reverse")


def test_scan_tail_seeds_from_writeback():
    """A chunk boundary that leaves a tail longer than the maskmem lookback:
    the per-frame tail must see the scan's written-back history (otherwise
    its memory rows would all be invalid and masks diverge)."""
    cfg = _tiny_cfg(fill_hole_area=0)
    pred = _make_pred(cfg)
    frames = _frames(16, seed=7)
    prompts = [(0, 1, [30.0, 60.0])]
    ref, _ = _propagate(pred, frames, prompts, scan_chunk=0)
    got, _ = _propagate(pred, frames, prompts, scan_chunk=8)  # 15-frame run:
    # one full chunk of 8, per-frame tail of 7 > num_maskmem - 1
    _assert_close(got, ref, "tail")
