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
