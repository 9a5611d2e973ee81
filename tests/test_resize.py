"""Parity tests: ops.resize vs torch F.interpolate."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from no_time_to_train_tpu.ops.resize import resize, resize_hw, resize_bilinear_dynamic  # noqa: E402


def _torch_resize(x_nchw, out_hw, mode, antialias):
    t = torch.from_numpy(x_nchw)
    kw = dict(size=out_hw, mode=mode)
    if mode != "nearest":
        kw["align_corners"] = False
        kw["antialias"] = antialias
    return TF.interpolate(t, **kw).numpy()


CASES = [
    ("bilinear", False, 37, 256),     # DINO grid -> lr mask size (upsample)
    ("bilinear", True, 256, 37),      # antialiased downsample
    ("bilinear", True, 256, 480),     # antialias flag but upsample (no-op)
    ("bicubic", False, 224, 518),     # fill-memory image resize
    ("bicubic", False, 14, 256),      # pos-embed interpolation
    ("nearest", False, 512, 37),      # mask -> encoder grid
    ("nearest", False, 16, 64),
]


@pytest.mark.parametrize("mode,antialias,in_s,out_s", CASES)
def test_resize_matches_torch(mode, antialias, in_s, out_s, rng):
    x = rng.standard_normal((2, 3, in_s, in_s)).astype(np.float32)
    ref = _torch_resize(x, (out_s, out_s), mode, antialias)
    # ours is NHWC
    got = resize(jnp.asarray(x.transpose(0, 2, 3, 1)), (out_s, out_s),
                 mode=mode, antialias=antialias)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_resize_rect(rng):
    x = rng.standard_normal((1, 3, 64, 48)).astype(np.float32)
    ref = _torch_resize(x, (100, 30), "bilinear", True)
    got = resize(jnp.asarray(x.transpose(0, 2, 3, 1)), (100, 30),
                 mode="bilinear", antialias=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=5e-4, rtol=1e-3)


def test_resize_hw_layout(rng):
    x = rng.standard_normal((5, 32, 32)).astype(np.float32)
    ref = _torch_resize(x[:, None], (64, 64), "bilinear", False)[:, 0]
    got = resize_hw(jnp.asarray(x), (64, 64), mode="bilinear")
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)


def test_dynamic_bilinear_matches_static(rng):
    x = rng.standard_normal((3, 64, 64)).astype(np.float32)
    out_h, out_w = 100, 75
    ref = _torch_resize(x[:, None], (out_h, out_w), "bilinear", False)[:, 0]
    buf = resize_bilinear_dynamic(jnp.asarray(x), (128, 128), out_h, out_w)
    got = np.asarray(buf)[:, :out_h, :out_w]
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    assert np.all(np.asarray(buf)[:, out_h:, :] == 0)
    assert np.all(np.asarray(buf)[:, :, out_w:] == 0)
