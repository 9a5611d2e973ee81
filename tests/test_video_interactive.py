"""Interactive video-predictor API semantics (reference
sam2/sam2_video_predictor.py): correction clicks on already-tracked frames,
reset_state, non-cond memory clearing, prompt validation, and multi-object
consolidation placeholders. Numeric parity of the correction path vs the
torch oracle lives in test_video_predictor.py; these tests pin the host-side
state-machine behavior on a tiny config."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from no_time_to_train_tpu.config.presets import Sam2Config
from no_time_to_train_tpu.models.sam2.model import SAM2, NO_OBJ_SCORE
from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor

IMG = 128


def _tiny_cfg(**kw):
    return Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=IMG, fill_hole_area=0, **kw)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = _tiny_cfg()
    model = SAM2(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3)),
                        method=model.init_everything)["params"]
    return model, params


def _make_pred(tiny_model, **kw):
    model, params = tiny_model
    cfg_kw = {k: kw.pop(k) for k in list(kw)
              if k in ("add_all_frames_to_correct_as_cond",)}
    if cfg_kw:
        model = SAM2(dataclasses.replace(model.cfg, **cfg_kw))
    return SAM2VideoPredictor(model, params, **kw)


def _frames(T, seed=3):
    rng = np.random.default_rng(seed)
    frames = rng.random((T, IMG, IMG, 3)).astype(np.float32)
    for t in range(T):
        x0 = 10 + 3 * t
        frames[t, 40:90, x0:x0 + 40] = 0.9
    return frames


def _track_all(pred, state, **kw):
    return {t: np.asarray(m) for t, _, m in
            pred.propagate_in_video(state, **kw)}


def test_correction_click_updates_tracking(tiny_model):
    pred = _make_pred(tiny_model)
    pred.scan_chunk = 0
    frames = _frames(6)
    state = pred.init_state(frames)
    pred.add_new_points_or_box(state, 0, 1,
                               points=np.array([[30.0, 60.0]], np.float32),
                               labels=np.array([1], np.int32))
    first = _track_all(pred, state)
    assert set(state["frames_already_tracked"]) == set(range(6))

    # correction click on tracked frame 3: stored under non_cond by default
    pred.add_new_points_or_box(
        state, 3, 1,
        points=np.array([[30.0, 60.0], [100.0, 30.0]], np.float32),
        labels=np.array([1, 0], np.int32))
    outs = state["output_dict_per_obj"][0]
    assert 3 in outs["non_cond"] and 3 not in outs["cond"]
    assert state["dirty_prompt_frames"] == {3: False}

    second = _track_all(pred, state, start_frame_idx=3)
    # the prompted frame's yield is the stored corrected output
    corrected = np.asarray(
        jnp.reshape(outs["non_cond"][3]["pred_masks"], second[3].shape[1:]))
    np.testing.assert_allclose(second[3][0], corrected, atol=1e-5)
    # the correction must differ from the plain tracked output and change
    # the frames tracked after it
    assert not np.allclose(second[3], first[3], atol=1e-3)
    assert not np.allclose(second[4], first[4], atol=1e-3)
    assert 3 in state["consolidated_frame_inds"]["non_cond"]
    # consolidation attached fresh memory to the corrected frame
    assert "maskmem_features" in outs["non_cond"][3]


def test_add_all_frames_to_correct_as_cond(tiny_model):
    pred = _make_pred(tiny_model, add_all_frames_to_correct_as_cond=True)
    pred.scan_chunk = 0
    state = pred.init_state(_frames(5))
    pred.add_new_points_or_box(state, 0, 1,
                               points=np.array([[30.0, 60.0]], np.float32),
                               labels=np.array([1], np.int32))
    _track_all(pred, state)
    pred.add_new_points_or_box(state, 2, 1,
                               points=np.array([[36.0, 60.0]], np.float32),
                               labels=np.array([1], np.int32))
    outs = state["output_dict_per_obj"][0]
    assert 2 in outs["cond"] and 2 not in outs["non_cond"]
    _track_all(pred, state, start_frame_idx=2)
    assert 2 in state["consolidated_frame_inds"]["cond"]


def test_clear_non_cond_mem_around_input(tiny_model):
    pred = _make_pred(tiny_model, clear_non_cond_mem_around_input=True)
    pred.scan_chunk = 0
    pred.history_window = 0  # keep every entry so the clearing is observable
    state = pred.init_state(_frames(6))
    pred.add_new_points_or_box(state, 0, 1,
                               points=np.array([[30.0, 60.0]], np.float32),
                               labels=np.array([1], np.int32))
    _track_all(pred, state)
    nc = state["output_dict_per_obj"][0]["non_cond"]
    assert set(nc) == set(range(1, 6))
    pred.add_new_points_or_box(state, 3, 1,
                               points=np.array([[100.0, 30.0]], np.float32),
                               labels=np.array([0], np.int32))
    pred.propagate_in_video_preflight(state)
    # all non-cond memories in the +-num_maskmem window cleared except the
    # corrected frame's own consolidated output
    assert set(nc) == {3}
    assert "maskmem_features" in nc[3]


def test_reset_state_and_new_object_guard(tiny_model):
    pred = _make_pred(tiny_model)
    state = pred.init_state(_frames(4))
    pred.add_new_points(state, 0, 1,
                        points=np.array([[30.0, 60.0]], np.float32),
                        labels=np.array([1], np.int32))
    _track_all(pred, state)
    with pytest.raises(RuntimeError, match="after tracking starts"):
        pred.add_new_points_or_box(
            state, 0, 2, points=np.array([[50.0, 50.0]], np.float32),
            labels=np.array([1], np.int32))
    pred.reset_state(state)
    assert not state["obj_id_to_idx"] and not state["output_dict_per_obj"]
    assert not state["tracking_has_started"]
    assert not state["frames_already_tracked"]
    # a fresh session over the same (still-uploaded) frames works
    pred.add_new_points_or_box(state, 1, 2,
                               points=np.array([[33.0, 60.0]], np.float32),
                               labels=np.array([1], np.int32))
    masks = _track_all(pred, state)
    assert set(masks) == set(range(1, 4))


def test_prompt_validation(tiny_model):
    pred = _make_pred(tiny_model)
    state = pred.init_state(_frames(3))
    with pytest.raises(ValueError, match="provided together"):
        pred.add_new_points_or_box(
            state, 0, 1, points=np.array([[1.0, 1.0]], np.float32))
    with pytest.raises(ValueError, match="at least one"):
        pred.add_new_points_or_box(state, 0, 1)
    with pytest.raises(ValueError, match="clearing old points"):
        pred.add_new_points_or_box(
            state, 0, 1, box=np.array([10, 10, 60, 60], np.float32),
            clear_old_points=False)
    pred.add_new_points_or_box(state, 0, 1,
                               box=np.array([10, 40, 50, 90], np.float32))
    _track_all(pred, state)
    with pytest.warns(UserWarning, match="box after tracking"):
        pred.add_new_points_or_box(state, 1, 1,
                                   box=np.array([10, 40, 50, 90], np.float32))


def test_mask_prompt_tracking(tiny_model):
    """add_new_mask with use_mask_input_as_output_without_sam (the default):
    the prompted frame yields the mask-as-output logits (scale 20, bias -10,
    reference sam2_base.py:457-507) and propagation tracks from its encoded
    memory."""
    pred = _make_pred(tiny_model)
    pred.scan_chunk = 0
    state = pred.init_state(_frames(4))
    gt = np.zeros((IMG, IMG), np.float32)
    gt[40:90, 10:50] = 1.0
    fidx, obj_ids, masks = pred.add_new_mask(state, 0, 1, gt)
    assert fidx == 0 and obj_ids == [1]
    hw = IMG // 4
    assert masks.shape == (1, hw, hw)
    tracked = _track_all(pred, state)
    assert set(tracked) == set(range(4))
    # prompted-frame yield equals the stored mask-as-output logits, which
    # binarize back to (a downsample of) the input mask
    got = tracked[0][0] > 0
    want = np.asarray(gt[::4, ::4] > 0.5)
    inter, union = (got & want).sum(), (got | want).sum()
    assert inter / union > 0.8
    # later frames track a real (finite-logit) mask
    assert np.isfinite(tracked[2]).all()
    assert (tracked[2] > 0).sum() > 0


def test_multi_object_placeholder_consolidation(tiny_model):
    """Objects prompted on DIFFERENT frames: consolidation fills the missing
    object on each prompted frame with a NO_OBJ_SCORE mask memory and an
    empty-mask pointer (reference _consolidate_temp_output_across_obj)."""
    pred = _make_pred(tiny_model)
    pred.scan_chunk = 0
    state = pred.init_state(_frames(5))
    pred.add_new_points_or_box(state, 0, 1,
                               points=np.array([[30.0, 60.0]], np.float32),
                               labels=np.array([1], np.int32))
    pred.add_new_points_or_box(state, 2, 2,
                               points=np.array([[100.0, 30.0]], np.float32),
                               labels=np.array([1], np.int32))
    masks = _track_all(pred, state)
    assert all(m.shape[0] == 2 for m in masks.values())
    # obj 2 (idx 1) got a placeholder cond entry on frame 0, and vice versa
    for idx, t in ((1, 0), (0, 2)):
        out = state["output_dict_per_obj"][idx]["cond"][t]
        assert "maskmem_features" in out
        assert np.all(np.asarray(out["pred_masks"]) == NO_OBJ_SCORE)
    # placeholder masks render as NO_OBJ_SCORE in the prompted-frame yield
    assert np.all(masks[0][1] <= NO_OBJ_SCORE + 1e-6)


def test_output_video_res(tiny_model):
    """propagate_in_video(output_video_res=True) matches the reference's
    video-resolution yield (_get_orig_video_res_output, sam2_video_predictor
    .py:402-422): bilinear upsample of the low-res logits to the ORIGINAL
    video H/W, plus the cross-object non-overlap constraint when the
    predictor is built with non_overlap_masks=True. Covers both the
    per-frame and the chunked-scan yield paths."""
    from no_time_to_train_tpu.models.sam2.video import (
        apply_non_overlapping_constraints)
    from no_time_to_train_tpu.ops.resize import resize_hw

    vh, vw = 96, 200
    prompts = [(1, [30.0, 60.0]), (2, [60.0, 70.0])]

    def run(pred, scan, **kw):
        state = pred.init_state(_frames(9), video_height=vh, video_width=vw)
        pred.scan_chunk = scan
        for oid, pt in prompts:
            pred.add_new_points_or_box(
                state, 0, oid, points=np.array([pt], np.float32),
                labels=np.array([1], np.int32))
        return _track_all(pred, state, **kw)

    pred = _make_pred(tiny_model)
    for scan in (0, 4):
        low = run(pred, scan)
        full = run(pred, scan, output_video_res=True)
        assert set(low) == set(full) == set(range(9))
        for t in low:
            assert full[t].shape == (2, vh, vw)
            want = np.asarray(resize_hw(jnp.asarray(low[t]), (vh, vw)))
            np.testing.assert_allclose(full[t], want, atol=1e-5)

    # non_overlap_masks=True applies the constraint AFTER the upsample
    pred_no = _make_pred(tiny_model, non_overlap_masks=True)
    low = run(pred_no, 0)
    constrained = run(pred_no, 0, output_video_res=True)
    t = 5
    up = resize_hw(jnp.asarray(low[t]), (vh, vw))
    want = np.asarray(apply_non_overlapping_constraints(up))
    np.testing.assert_allclose(constrained[t], want, atol=1e-5)
    # at most one object above the clip ceiling per pixel
    assert ((constrained[t] > -10.0).sum(axis=0) <= 1).all()

    # identity shortcut: masks already at video res, no constraint
    pred2 = _make_pred(tiny_model)
    state = pred2.init_state(_frames(3), video_height=IMG // 4,
                             video_width=IMG // 4)
    m = jnp.zeros((1, IMG // 4, IMG // 4))
    any_res, video_res = pred2.get_orig_video_res_output(state, m)
    assert video_res is any_res


def test_scan_abandon_writes_back(tiny_model):
    """Abandoning propagate_in_video mid-run on the chunked-scan path must
    still write per-frame non_cond entries for the yielded frames — a later
    correction click or resumed propagate on them reads the memory bank."""
    import gc

    pred = _make_pred(tiny_model)
    pred.scan_chunk = 2
    state = pred.init_state(_frames(8))
    pred.add_new_points_or_box(state, 0, 1,
                               points=np.array([[64.0, 64.0]], np.float32),
                               labels=np.array([1], np.int32))
    seen = []
    for i, (t, _, m) in enumerate(pred.propagate_in_video(state)):
        seen.append(t)
        if i == 3:
            break  # abandon the suspended generator
    gc.collect()  # GeneratorExit -> the finally-writeback
    nc = state["output_dict_per_obj"][0]["non_cond"]
    for t in seen[1:]:  # seen[0] is the prompted (cond) frame
        assert t in nc and "maskmem_features" in nc[t], t
    # a correction click on an abandoned-but-yielded frame sees real memory
    _, obj_ids, masks = pred.add_new_points_or_box(
        state, seen[2], 1, points=np.array([[60.0, 60.0]], np.float32),
        labels=np.array([1], np.int32))
    assert obj_ids == [1] and masks.shape[0] == 1


def test_click_one_object_leaves_others_untouched(tiny_model):
    """Clicking object B on a frame must not re-decode (and thus mutate)
    object A's stored output on that frame — the reference decodes only the
    clicked object (sam2_video_predictor.py:252-301)."""
    pred = _make_pred(tiny_model)
    pred.scan_chunk = 0
    state = pred.init_state(_frames(4))
    for oid, pt in ((1, [64.0, 64.0]), (2, [30.0, 100.0])):
        pred.add_new_points_or_box(state, 0, oid,
                                   points=np.array([pt], np.float32),
                                   labels=np.array([1], np.int32))
    _track_all(pred, state)
    # correct obj 1 on a tracked frame, then click obj 2 on the same frame
    pred.add_new_points_or_box(state, 2, 1,
                               points=np.array([[66.0, 66.0]], np.float32),
                               labels=np.array([1], np.int32))
    before = np.asarray(
        state["output_dict_per_obj"][0]["non_cond"][2]["pred_masks"])
    _, obj_ids, masks = pred.add_new_points_or_box(
        state, 2, 2, points=np.array([[32.0, 98.0]], np.float32),
        labels=np.array([1], np.int32))
    after = np.asarray(
        state["output_dict_per_obj"][0]["non_cond"][2]["pred_masks"])
    np.testing.assert_array_equal(before, after)
    # the return still combines both prompted objects on the frame
    assert obj_ids == [1, 2] and masks.shape[0] == 2
