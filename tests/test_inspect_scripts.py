"""Runnable checks for the inspection/eval CLIs against synthetic outputs:
tools/inspect_cocoeval.py (reference root inspect_cocoeval.py TP/FP/FN +
P/R/F1 extraction, work-dir discovery) and scripts/coco_inst_to_segm.py +
launch_coco_semantic_eval.sh (reference coco_inst_to_segm.py CLI)."""
import importlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from no_time_to_train_tpu.data import rle as rle_mod

inspect_mod = importlib.import_module("tools.inspect_cocoeval")
segm_cli = importlib.import_module("scripts.coco_inst_to_segm")


def _box_mask(h, w, y0, x0, s):
    m = np.zeros((h, w), np.uint8)
    m[y0:y0 + s, x0:x0 + s] = 1
    return m


def _gt_and_preds(tmp_path, cat_names=("person", "dog")):
    """2 images; image 1 has one instance per category, image 2 has one
    'person'. Predictions: exact hit on each image-1 instance, one miss on
    image 2, one spurious extra on image 1."""
    images = [{"id": 1, "height": 64, "width": 64, "file_name": "a.png"},
              {"id": 2, "height": 64, "width": 64, "file_name": "b.png"}]
    cats = [{"id": i + 1, "name": n} for i, n in enumerate(cat_names)]
    anns, aid = [], 1
    layout = [(1, 1, 4, 4), (1, 2, 4, 40), (2, 1, 20, 20)]
    for img_id, cat_id, y0, x0 in layout:
        m = _box_mask(64, 64, y0, x0, 16)
        anns.append({"id": aid, "image_id": img_id, "category_id": cat_id,
                     "bbox": [x0, y0, 16, 16], "area": 256.0, "iscrowd": 0,
                     "segmentation": rle_mod.encode_mask(m)})
        aid += 1
    gt = {"images": images, "annotations": anns, "categories": cats}
    gp = tmp_path / "gt.json"
    gp.write_text(json.dumps(gt))
    preds = [
        {"image_id": 1, "category_id": 1, "score": 0.95, "bbox": [4, 4, 16, 16],
         "segmentation": rle_mod.encode_mask(_box_mask(64, 64, 4, 4, 16))},
        {"image_id": 1, "category_id": 2, "score": 0.9, "bbox": [40, 4, 16, 16],
         "segmentation": rle_mod.encode_mask(_box_mask(64, 64, 4, 40, 16))},
        # spurious person far from any GT
        {"image_id": 1, "category_id": 1, "score": 0.8, "bbox": [44, 44, 12, 12],
         "segmentation": rle_mod.encode_mask(_box_mask(64, 64, 44, 44, 12))},
        # image 2: no prediction -> FN for person
    ]
    pp = tmp_path / "preds.json"
    pp.write_text(json.dumps(preds))
    return str(gp), str(pp)


def test_confusion_matrix_counts(tmp_path):
    from no_time_to_train_tpu.data.coco_api import COCO
    gp, pp = _gt_and_preds(tmp_path)
    coco_gt = COCO(gp)
    coco_dt = coco_gt.loadRes(pp)
    match_data, counts = inspect_mod.compute_confusion_matrix(
        coco_gt, coco_dt, "Test_Segm", iou_type="segm")
    assert counts["person"] == {"TP": 1, "FP": 1, "FN": 1}
    assert counts["dog"] == {"TP": 1, "FP": 0, "FN": 0}
    types = {m["type"] for m in match_data}
    assert types == {"TP", "FP", "FN"}
    # every TP row carries both ids, FP rows no gt, FN rows no dt
    for m in match_data:
        if m["type"] == "TP":
            assert m["dt_id"] is not None and m["gt_id"]
        elif m["type"] == "FP":
            assert m["gt_id"] is None
        else:
            assert m["dt_id"] is None


def test_work_dir_discovery_and_main(tmp_path, capsys, monkeypatch):
    gp, pp = _gt_and_preds(tmp_path)
    # work-dir layout: work/<run>/nttt_predictions.json (newest run wins)
    for i, run in enumerate(["run_old", "run_new"]):
        d = tmp_path / "work" / run
        d.mkdir(parents=True)
        dst = d / "nttt_predictions.json"
        dst.write_text(open(pp).read())
        os.utime(dst, (time.time() + i, time.time() + i))
    got = inspect_mod.get_latest_predictions(str(tmp_path / "work"),
                                             "nttt_predictions.json")
    assert "run_new" in got
    monkeypatch.setattr(sys, "argv",
                        ["inspect_cocoeval.py", "--gt-json", gp,
                         "--work-dir", str(tmp_path / "work"),
                         "--cross-class"])
    inspect_mod.main()  # sam3 dump absent -> prints the miss, evaluates NTTT
    out = capsys.readouterr().out
    assert "Confusion Matrix for NTTT_Segm" in out
    assert "Precision" in out and "person" in out
    assert "rows = GT class" in out  # cross-class extra


def test_coco_inst_to_segm_cli(tmp_path, capsys):
    # cat names must live in the metainfo split (coco_semantic_split_1)
    gp, pp = _gt_and_preds(tmp_path, cat_names=("person", "dog"))
    out = segm_cli.main(["--pred_json", pp, "--class_split",
                         "coco_semantic_split_1", "--gt_json", gp])
    printed = capsys.readouterr().out
    assert "Mean IoU:" in printed
    # person: pred covers one GT exactly but misses image-2's instance and
    # adds a 12x12 spurious region; dog: exact -> IoU 1.0
    assert abs(out["per_class_iou"][2] - 1.0) < 1e-9
    expect_person = 256.0 / (2 * 256 + 144)
    assert abs(out["per_class_iou"][1] - expect_person) < 1e-9


def test_launch_script_wiring():
    """launch_coco_semantic_eval.sh drives the CLI with the reference's
    split/shot/seed filename scheme."""
    sh = open("/root/repo/scripts/launch_coco_semantic_eval.sh").read()
    assert "scripts/coco_inst_to_segm.py" in sh
    assert "coco_semantic_split_${SPLIT}" in sh
    assert "${SHOT}shot_${SEED}seed_results.json" in sh
