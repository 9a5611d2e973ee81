"""Parity: mask->box, NMS vs torch/torchvision-free references."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from ref_loader import install_reference_shim, reference_available  # noqa: E402
from no_time_to_train_tpu.ops.masks import batched_mask_to_box, stability_score  # noqa: E402
from no_time_to_train_tpu.ops.nms import batched_nms, take_first_kept, box_iou  # noqa: E402


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_batched_mask_to_box(rng):
    install_reference_shim()
    from sam2.utils.amg import batched_mask_to_box as ref_fn
    masks = rng.random((16, 32, 32)) > 0.8
    masks[3] = False  # empty mask case
    ref = ref_fn(torch.from_numpy(masks)).numpy()
    got = np.asarray(batched_mask_to_box(jnp.asarray(masks)))
    np.testing.assert_array_equal(got, ref)


def _ref_batched_nms(boxes, scores, classes, thr):
    """Pure-python torchvision batched_nms semantics."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j] or classes[j] != classes[i]:
                continue
            if scores[j] <= scores[i]:
                xa1, ya1, xa2, ya2 = boxes[i]
                xb1, yb1, xb2, yb2 = boxes[j]
                iw = max(0.0, min(xa2, xb2) - max(xa1, xb1))
                ih = max(0.0, min(ya2, yb2) - max(ya1, yb1))
                inter = iw * ih
                ua = (xa2 - xa1) * (ya2 - ya1) + (xb2 - xb1) * (yb2 - yb1) - inter
                if ua > 0 and inter / ua > thr:
                    # only suppress lower-ranked boxes
                    if list(order).index(j) > list(order).index(i):
                        suppressed[j] = True
    return keep


def test_batched_nms_matches_torchvision_semantics(rng):
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.random(n) * 50
    boxes[:, 1] = rng.random(n) * 50
    boxes[:, 2] = boxes[:, 0] + 5 + rng.random(n) * 30
    boxes[:, 3] = boxes[:, 1] + 5 + rng.random(n) * 30
    scores = rng.random(n).astype(np.float32)
    classes = rng.integers(0, 3, n)
    thr = 0.3

    ref_keep = _ref_batched_nms(boxes, scores, classes, thr)

    order, keep = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(classes), jnp.ones(n, bool), thr)
    got_keep = [int(o) for o, k in zip(np.asarray(order), np.asarray(keep)) if k]
    assert got_keep == ref_keep

    sel, valid = take_first_kept(order, keep, 8)
    assert list(np.asarray(sel)[np.asarray(valid)]) == ref_keep[:8]


def test_nms_respects_validity(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.95], np.float32)
    classes = np.zeros(3, np.int32)
    valid = np.array([True, True, False])
    order, keep = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(classes), jnp.asarray(valid), 0.5)
    kept = [int(o) for o, k in zip(np.asarray(order), np.asarray(keep)) if k]
    assert kept == [0]  # 2 invalid; 1 suppressed by 0


def test_stability_score(rng):
    logits = rng.standard_normal((5, 16, 16)).astype(np.float32) * 3
    inter = (logits > 1.0).sum((-1, -2))
    union = (logits > -1.0).sum((-1, -2))
    got = np.asarray(stability_score(jnp.asarray(logits)))
    np.testing.assert_allclose(got, inter / union, atol=1e-6)
