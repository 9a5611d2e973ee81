"""Video predictor parity vs the reference SAM2VideoPredictor on a tiny
synthetic video (point prompt on frame 0, propagate 4 frames)."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import (install_reference_shim, install_torchvision_shim,  # noqa: E402
                        reference_available, _instantiate, REF)

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)
install_reference_shim()
install_torchvision_shim()

import yaml  # noqa: E402

from no_time_to_train_tpu.config.presets import SAM2_PRESETS  # noqa: E402
from no_time_to_train_tpu.models.sam2.model import SAM2  # noqa: E402
from no_time_to_train_tpu.models.sam2.video import SAM2VideoPredictor  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import (convert_sam2,  # noqa: E402
                                                      torch_sd_to_numpy)

IMG = 256
T_FRAMES = 4


def _build_ref_video_predictor(image_size, seed=0):
    with open(REF / "sam2_configs" / "sam2_hiera_t.yaml") as f:
        cfg = yaml.safe_load(f)["model"]
    cfg["_target_"] = "sam2.sam2_video_predictor.SAM2VideoPredictor"
    cfg["image_size"] = image_size
    cfg.setdefault("sam_mask_decoder_extra_args", {}).update(
        dynamic_multimask_via_stability=True,
        dynamic_multimask_stability_delta=0.05,
        dynamic_multimask_stability_thresh=0.98)
    cfg["binarize_mask_from_pts_for_mem_enc"] = True
    cfg["fill_hole_area"] = 8
    model = _instantiate(cfg)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    return model.eval()


def test_video_propagation_parity(tmp_path, rng):
    # synthetic frames: a moving bright square
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    frames = []
    paths = []
    for t in range(T_FRAMES):
        arr = (rng.random((IMG, IMG, 3)) * 60).astype(np.uint8)
        x0 = 60 + 12 * t
        arr[80:150, x0:x0 + 70] = [220, 50, 50]
        frames.append(arr)
        p = frames_dir / f"{t:04d}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))

    t_pred = _build_ref_video_predictor(IMG)
    with torch.no_grad():
        ref_state = t_pred.init_state(str(frames_dir), paths)
        t_pred.add_new_points_or_box(
            ref_state, frame_idx=0, obj_id=1,
            points=np.array([[95.0, 115.0]], np.float32),
            labels=np.array([1], np.int32))
        ref_masks = {}
        for fidx, obj_ids, logits in t_pred.propagate_in_video(ref_state):
            ref_masks[fidx] = logits[0, 0].cpu().numpy()

    # ours: the predictor consumes the SAME decoded frames the reference
    # loaded (PIL resize parity is covered by test_resize)
    loaded = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((IMG, IMG))) / 255.0
        for p in paths]).astype(np.float32)

    # reference's hole filling is skipped without CUDA _C; disable ours too
    cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"],
                              image_size=IMG, fill_hole_area=0)
    model = SAM2(cfg)
    params = convert_sam2(torch_sd_to_numpy(t_pred), cfg)
    pred = SAM2VideoPredictor(model, params)
    state = pred.init_state(loaded)
    pred.add_new_points_or_box(state, 0, 1,
                               points=np.array([[95.0, 115.0]], np.float32),
                               labels=np.array([1], np.int32))
    from no_time_to_train_tpu.ops.resize import resize_hw
    got_masks = {}
    for fidx, obj_ids, logits in pred.propagate_in_video(state):
        up = resize_hw(jnp.asarray(logits[0]), (IMG, IMG), mode="bilinear")
        got_masks[fidx] = np.asarray(up)

    assert set(got_masks) == set(ref_masks)
    for t in sorted(ref_masks):
        r = ref_masks[t] > 0
        g = got_masks[t] > 0
        inter, union = (r & g).sum(), (r | g).sum()
        iou = 1.0 if union == 0 else inter / union
        assert iou > 0.97, f"frame {t}: IoU {iou:.3f}"
        # logits close where confidently fg/bg
        conf = np.abs(ref_masks[t]) > 0.2
        np.testing.assert_allclose(got_masks[t][conf], ref_masks[t][conf],
                                   atol=0.25, rtol=0.5)


def _compare_logits(ref_masks, got_masks, min_iou=0.97):
    assert set(got_masks) == set(ref_masks)
    for t in sorted(ref_masks):
        r = ref_masks[t] > 0
        g = got_masks[t] > 0
        inter, union = (r & g).sum(), (r | g).sum()
        iou = 1.0 if union == 0 else inter / union
        assert iou > min_iou, f"frame {t}: IoU {iou:.3f}"
        conf = np.abs(ref_masks[t]) > 0.2
        np.testing.assert_allclose(got_masks[t][conf], ref_masks[t][conf],
                                   atol=0.25, rtol=0.5)


def test_correction_click_parity(tmp_path, rng):
    """Correction clicks on an already-tracked frame (reference
    sam2_video_predictor.py:262-301): memory-conditioned decode seeded with
    the previous mask logits, stored as a non-cond output, then re-propagated.
    """
    T = 5
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    paths = []
    for t in range(T):
        arr = (rng.random((IMG, IMG, 3)) * 60).astype(np.uint8)
        x0 = 60 + 12 * t
        arr[80:150, x0:x0 + 70] = [220, 50, 50]
        p = frames_dir / f"{t:04d}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    pt0 = (np.array([[95.0, 115.0]], np.float32), np.array([1], np.int32))
    # correction on frame 2: a positive click inside the moved square plus a
    # negative click in the background
    pt2 = (np.array([[120.0, 115.0], [40.0, 40.0]], np.float32),
           np.array([1, 0], np.int32))

    t_pred = _build_ref_video_predictor(IMG)
    with torch.no_grad():
        ref_state = t_pred.init_state(str(frames_dir), paths)
        t_pred.add_new_points_or_box(ref_state, 0, 1, points=pt0[0],
                                     labels=pt0[1])
        for _ in t_pred.propagate_in_video(ref_state):
            pass
        _, _, ref_click = t_pred.add_new_points_or_box(
            ref_state, 2, 1, points=pt2[0], labels=pt2[1])
        ref_click = ref_click[0, 0].cpu().numpy()
        ref_masks = {}
        for fidx, _, logits in t_pred.propagate_in_video(
                ref_state, start_frame_idx=2):
            ref_masks[fidx] = logits[0, 0].cpu().numpy()

    loaded = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((IMG, IMG))) / 255.0
        for p in paths]).astype(np.float32)
    cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"],
                              image_size=IMG, fill_hole_area=0)
    model = SAM2(cfg)
    params = convert_sam2(torch_sd_to_numpy(t_pred), cfg)
    pred = SAM2VideoPredictor(model, params)
    state = pred.init_state(loaded)
    pred.add_new_points_or_box(state, 0, 1, points=pt0[0], labels=pt0[1])
    for _ in pred.propagate_in_video(state):
        pass
    _, _, got_click = pred.add_new_points_or_box(state, 2, 1, points=pt2[0],
                                                 labels=pt2[1])
    from no_time_to_train_tpu.ops.resize import resize_hw
    got_click = np.asarray(resize_hw(jnp.asarray(got_click), (IMG, IMG),
                                     mode="bilinear"))[0]
    # the correction decode itself matches (memory-conditioned heads with
    # clicks + previous logits as the dense prompt)
    _compare_logits({2: ref_click}, {2: got_click})
    # correction stored under non_cond (add_all_frames_to_correct_as_cond off)
    outs = state["output_dict_per_obj"][0]
    assert 2 in outs["non_cond"] and 2 not in outs["cond"]

    got_masks = {}
    for fidx, _, logits in pred.propagate_in_video(state, start_frame_idx=2):
        up = resize_hw(jnp.asarray(logits[0]), (IMG, IMG), mode="bilinear")
        got_masks[fidx] = np.asarray(up)
    _compare_logits(ref_masks, got_masks)


def test_non_overlap_and_click_accumulation(rng):
    import jax.numpy as jnp
    from no_time_to_train_tpu.models.sam2.video import (
        apply_non_overlapping_constraints)
    masks = jnp.asarray(rng.standard_normal((3, 8, 8)), jnp.float32)
    out = np.asarray(apply_non_overlapping_constraints(masks))
    winner = np.asarray(masks).argmax(0)
    for i in range(3):
        overlap = (winner != i)
        assert np.all(out[i][overlap] <= -10.0 + 1e-6)
        np.testing.assert_array_equal(out[i][~overlap],
                                      np.asarray(masks)[i][~overlap])
