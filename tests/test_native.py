"""Native libnttt vs numpy fallbacks."""
import numpy as np
import pytest

from no_time_to_train_tpu.utils import native
from no_time_to_train_tpu.data import rle as rle_py

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def test_rle_roundtrip_native_matches_python(rng):
    for _ in range(4):
        m = (rng.random((37, 53)) > 0.65).astype(np.uint8)
        s_native = native.rle_encode(m)
        s_py = rle_py.encode_mask(m)["counts"]
        assert s_native == s_py
        dec = native.rle_decode(s_native, 37, 53)
        np.testing.assert_array_equal(dec, m)


def test_mask_iou_native(rng):
    dt = (rng.random((4, 20, 20)) > 0.5)
    gt = (rng.random((3, 20, 20)) > 0.5)
    crowd = np.array([0, 1, 0], np.uint8)
    got = native.mask_iou(dt, gt, crowd)
    dt_r = [rle_py.encode_mask(m) for m in dt]
    gt_r = [rle_py.encode_mask(m) for m in gt]
    ref = rle_py.iou_rle(dt_r, gt_r, crowd.tolist())
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_upsample_binarize(rng):
    import jax.numpy as jnp
    from no_time_to_train_tpu.ops.resize import resize_hw
    logits = rng.standard_normal((3, 32, 32)).astype(np.float32) * 2
    got = native.upsample_binarize(logits, 77, 61)
    ref = np.asarray(resize_hw(jnp.asarray(logits), (77, 61),
                               mode="bilinear")) > 0
    # boundary pixels may flip on exact-zero crossings; demand near-identity
    agree = (got == ref).mean()
    assert agree > 0.999, agree


def test_finalize_mask_fused_parity(rng):
    """finalize_mask (one-pass upsample+binarize+RLE+box, never
    materializing the full-res mask) must be byte-identical to the split
    path: upsample_binarize -> rle_encode -> nonzero box."""
    if not native.has_finalize():
        pytest.skip("native lib without finalize_mask")
    for oh, ow, kind in ((480, 640, "blob"), (333, 517, "noise"),
                         (64, 80, "blob")):
        if kind == "noise":
            logits = (rng.standard_normal((32, 40)) * 2).astype(np.float32)
        else:
            yy, xx = np.mgrid[0:32, 0:40].astype(np.float32)
            logits = (4.0 - 0.02 * ((yy - 14) ** 2 + (xx - 22) ** 2)) \
                .astype(np.float32)
        mask = native.upsample_binarize(logits[None], oh, ow)[0]
        c_ref = native.rle_encode(mask)
        ys, xs = np.nonzero(mask)
        box_ref = (np.array([xs.min(), ys.min(), xs.max(), ys.max()],
                            np.float32) if len(ys)
                   else np.zeros(4, np.float32))
        counts, box, npix = native.finalize_mask(logits, oh, ow)
        assert counts == c_ref
        np.testing.assert_array_equal(box, box_ref)
        assert npix == int(mask.sum())
    # empty / full
    counts, box, npix = native.finalize_mask(
        np.full((16, 16), -3.0, np.float32), 40, 48)
    assert npix == 0 and not box.any()
    assert native.rle_decode(counts, 40, 48).sum() == 0
    counts, box, npix = native.finalize_mask(
        np.full((16, 16), 3.0, np.float32), 40, 48)
    assert npix == 40 * 48 and list(box) == [0, 0, 47, 39]


def test_finalize_records_matches_split_path(rng):
    """pipeline.finalize_records == finalize_results + encode_mask on a
    synthetic padded device output (scores/labels/boxes/counts all equal),
    and the pool worker (utils/finalize_pool._finalize_row) agrees."""
    if not native.has_finalize():
        pytest.skip("native lib without finalize_mask")
    from no_time_to_train_tpu.models.matching.pipeline import (
        finalize_records, finalize_results)
    from no_time_to_train_tpu.utils.finalize_pool import _finalize_row
    k, lr, oh, ow = 6, 32, 90, 120
    out = dict(
        lr_logits=(rng.standard_normal((k, lr, lr)) * 2).astype(np.float16),
        scores=np.array([.9, .8, .7, .6, 0, 0], np.float32),
        labels=np.arange(k, dtype=np.int32),
        pred_ious=np.full(k, .5, np.float32),
        valid=np.array([1, 1, 1, 1, 0, 0], bool))
    rec = finalize_records(out, oh, ow)
    fin = finalize_results(out, oh, ow)
    assert len(rec["segs"]) == 4
    np.testing.assert_array_equal(rec["scores"], fin["scores"])
    np.testing.assert_array_equal(rec["labels"], fin["labels"])
    np.testing.assert_array_equal(rec["bboxes"], fin["bboxes"])
    for i, seg in enumerate(rec["segs"]):
        assert seg["counts"] == rle_py.encode_mask(
            fin["binary_masks"][i].astype(np.uint8))["counts"]
        assert seg["size"] == [oh, ow]
    segs_w, boxes_w = _finalize_row(out["lr_logits"][:4], oh, ow)
    assert segs_w == rec["segs"]
    np.testing.assert_array_equal(boxes_w, rec["bboxes"])
    # downscale target -> fused path declines (antialias semantics differ)
    assert finalize_records(out, 20, 24) is None
