"""LVISEval sanity: frequency buckets, neg-category filtering, maxDets=300."""
import json

import numpy as np

from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.lvis_eval import LVISEval


def _mk(tmp_path):
    data = {
        "images": [{"id": 1, "height": 32, "width": 32, "file_name": "a.jpg",
                    "neg_category_ids": [3],
                    "not_exhaustive_category_ids": []}],
        "categories": [{"id": 1, "name": "a", "frequency": "r"},
                       {"id": 2, "name": "b", "frequency": "f"},
                       {"id": 3, "name": "c", "frequency": "c"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [2, 2, 10, 10], "area": 100, "iscrowd": 0,
             "segmentation": [[2, 2, 12, 2, 12, 12, 2, 12]]},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [16, 16, 10, 10], "area": 100, "iscrowd": 0,
             "segmentation": [[16, 16, 26, 16, 26, 26, 16, 26]]},
        ],
    }
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(data))
    return COCO(str(p))


def test_lvis_eval(tmp_path):
    gt = _mk(tmp_path)
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [2, 2, 10, 10],
         "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [16, 16, 10, 10],
         "score": 0.8},
        # category 3 is negatively annotated -> must be dropped, not FP
        {"image_id": 1, "category_id": 3, "bbox": [0, 0, 5, 5],
         "score": 0.95},
    ]
    res = gt.loadRes([dict(d) for d in dets])
    ev = LVISEval(gt, res, "bbox")
    assert ev.params.maxDets == [300]
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert abs(stats["AP"] - 1.0) < 1e-6
    assert abs(stats["APr"] - 1.0) < 1e-6
    assert abs(stats["APf"] - 1.0) < 1e-6
    assert stats["APc"] == -1.0  # no cat-3 GT -> bucket empty
