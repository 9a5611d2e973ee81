"""CCL op vs scipy.ndimage 8-connectivity labeling."""
import numpy as np
import pytest

scipy_ndimage = pytest.importorskip("scipy.ndimage")
import jax.numpy as jnp  # noqa: E402

from no_time_to_train_tpu.ops.connected_components import (  # noqa: E402
    connected_components, fill_holes_in_mask_scores)


def _ref_label(mask):
    lab, n = scipy_ndimage.label(mask, structure=np.ones((3, 3)))
    areas = np.zeros_like(lab)
    for i in range(1, n + 1):
        areas[lab == i] = (lab == i).sum()
    return lab, areas


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ccl_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    mask = scipy_ndimage.binary_dilation(rng.random((48, 64)) > 0.9,
                                         iterations=2)
    ref_lab, ref_areas = _ref_label(mask)
    got_lab, got_areas = connected_components(jnp.asarray(mask))
    got_lab, got_areas = np.asarray(got_lab), np.asarray(got_areas)

    # same partition: label equivalence (bijection between label sets)
    assert (got_lab > 0).sum() == (ref_lab > 0).sum()
    np.testing.assert_array_equal(got_lab > 0, ref_lab > 0)
    pairs = set(zip(ref_lab[mask].tolist(), got_lab[mask].tolist()))
    assert len(pairs) == ref_lab.max()  # one-to-one
    np.testing.assert_array_equal(got_areas, ref_areas)


def test_fill_holes():
    m = np.full((32, 32), 5.0, np.float32)
    m[10:12, 10:12] = -1.0     # small hole (area 4)
    m[20:28, 20:28] = -1.0     # big hole (area 64)
    m[:2, :] = -1.0            # background border region touching edge
    out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(m), max_area=8))
    assert np.all(out[10:12, 10:12] == 0.1)       # filled
    assert np.all(out[20:28, 20:28] == -1.0)      # too big, kept
    assert np.all(out[0, :] == -1.0)              # big border bg, kept
