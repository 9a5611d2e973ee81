"""RLE codec, COCO api, and COCOeval sanity tests."""
import numpy as np
import pytest

from no_time_to_train_tpu.data import rle as rle_mod
from no_time_to_train_tpu.data.coco_api import COCO, rasterize_polygons
from no_time_to_train_tpu.data.cocoeval import COCOeval, bbox_iou_xywh


def test_rle_roundtrip(rng):
    for _ in range(5):
        m = (rng.random((37, 53)) > 0.7).astype(np.uint8)
        enc = rle_mod.encode_mask(m)
        dec = rle_mod.decode_rle(enc)
        np.testing.assert_array_equal(dec, m)
        assert rle_mod.area(enc) == int(m.sum())


def test_rle_string_negative_deltas():
    # delta encoding must survive decreasing counts
    counts = [0, 500, 3, 2, 1000, 1, 7]
    s = rle_mod.rle_to_string(counts)
    assert rle_mod.string_to_counts(s) == counts


def test_rasterize_square():
    # square [2, 2] - [6, 6): pixel centers 2.5..5.5 inside
    mask = rasterize_polygons([[2, 2, 6, 2, 6, 6, 2, 6]], 8, 8)
    expect = np.zeros((8, 8), np.uint8)
    expect[2:6, 2:6] = 1
    np.testing.assert_array_equal(mask, expect)


def test_bbox_iou_crowd():
    dt = [[0, 0, 10, 10]]
    gt = [[0, 0, 10, 10], [5, 5, 10, 10]]
    iou = bbox_iou_xywh(dt, gt, [0, 1])
    assert abs(iou[0, 0] - 1.0) < 1e-9
    # crowd: union = det area -> 25/100
    assert abs(iou[0, 1] - 0.25) < 1e-9


def _tiny_dataset():
    imgs = [{"id": 1, "height": 32, "width": 32, "file_name": "a.jpg"}]
    cats = [{"id": 7, "name": "cat"}]
    anns = [{"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [4, 4, 10, 10], "area": 100, "iscrowd": 0,
             "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]]}]
    return {"images": imgs, "categories": cats, "annotations": anns}


def test_cocoeval_perfect_and_fp(tmp_path):
    import json
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(_tiny_dataset()))
    coco = COCO(str(gt_path))

    seg = rle_mod.encode_mask(rasterize_polygons(
        [[4, 4, 14, 4, 14, 14, 4, 14]], 32, 32))
    det_tp = {"image_id": 1, "category_id": 7, "bbox": [4, 4, 10, 10],
              "score": 0.8, "segmentation": seg}
    for iou_type in ("bbox", "segm"):
        res = coco.loadRes([dict(det_tp)])
        ev = COCOeval(coco, res, iou_type)
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        assert abs(stats[0] - 1.0) < 1e-6, iou_type

    # add one higher-scoring FP -> AP 0.5
    fp_seg = rle_mod.encode_mask(rasterize_polygons(
        [[20, 20, 30, 20, 30, 30, 20, 30]], 32, 32))
    det_fp = {"image_id": 1, "category_id": 7, "bbox": [20, 20, 10, 10],
              "score": 0.9, "segmentation": fp_seg}
    res = coco.loadRes([dict(det_tp), det_fp])
    ev = COCOeval(coco, res, "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert abs(stats[0] - 0.5) < 1e-6


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference").exists(),
    reason="no reference")
def test_matches_pycocotools_if_available():
    try:
        import pycocotools.mask as pm
    except ImportError:
        pytest.skip("pycocotools not installed")
    m = (np.random.default_rng(0).random((25, 31)) > 0.6)
    ours = rle_mod.encode_mask(m)
    theirs = pm.encode(np.asfortranarray(m.astype(np.uint8)))
    assert ours["counts"] == theirs["counts"].decode()


def test_tide_error_analysis(tmp_path):
    """TIDE-style taxonomy (data/tide.py): synthetic GT with known TP / Cls /
    Loc / Bkg / Dupe / Miss detections classify correctly."""
    import json
    from no_time_to_train_tpu.data.coco_api import COCO
    from no_time_to_train_tpu.data.tide import tide_errors

    gt = {
        "images": [{"id": 1, "height": 100, "width": 100,
                    "file_name": "a.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0,
             "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]]},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [60, 60, 20, 20], "area": 400, "iscrowd": 0,
             "segmentation": [[60, 60, 80, 60, 80, 80, 60, 80]]},
            {"id": 3, "image_id": 1, "category_id": 1,
             "bbox": [40, 5, 10, 10], "area": 100, "iscrowd": 0,
             "segmentation": [[40, 5, 50, 5, 50, 15, 40, 15]]},
        ],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))
    coco = COCO(str(p))

    results = [
        # exact TP on gt1
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
        # duplicate of the TP (lower score)
        {"image_id": 1, "category_id": 1, "bbox": [11, 11, 20, 20],
         "score": 0.8},
        # wrong class on gt2 -> Cls
        {"image_id": 1, "category_id": 1, "bbox": [60, 60, 20, 20],
         "score": 0.7},
        # right class, mislocalized vs gt1 (IoU ~0.23) -> Loc
        {"image_id": 1, "category_id": 1, "bbox": [20, 20, 20, 20],
         "score": 0.6},
        # nowhere near anything -> Bkg
        {"image_id": 1, "category_id": 2, "bbox": [0, 80, 10, 10],
         "score": 0.5},
    ]
    c = tide_errors(coco, results, mode="bbox")
    assert c["TP"] == 1
    assert c["Dupe"] == 1
    assert c["Cls"] == 1
    assert c["Loc"] == 1
    assert c["Bkg"] == 1
    assert c["Miss"] == 1          # gt3 untouched
