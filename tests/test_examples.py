"""Smoke tests for the notebook-port example scripts (reference notebooks/
*.ipynb + sam3-fsl.ipynb): each script's analysis path runs end-to-end on
synthetic data and writes its figures/outputs."""
import json
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from no_time_to_train_tpu.data import rle as rle_mod

pytestmark = pytest.mark.filterwarnings("ignore")


def _run(args, cwd=None):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


def _toy_dataset(root, n_train=6, n_val=4, size=48):
    """COCO-format olive-like dataset with real image files + RLE segs."""
    rng = np.random.default_rng(0)
    cats = [{"id": 1, "name": "anthracnose"}, {"id": 2, "name": "healthy"}]
    (root / "annotations").mkdir(parents=True)
    for split, n in (("train2017", n_train), ("val2017", n_val)):
        d = root / split
        d.mkdir()
        imgs, anns = [], []
        aid = 1
        for i in range(n):
            fn = f"{i:06d}.png"
            arr = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(arr).save(d / fn)
            imgs.append({"id": i + 1, "file_name": fn,
                         "width": size, "height": size})
            for j in range(2):
                y0, x0 = 4 + 8 * j, 6 + 4 * j
                m = np.zeros((size, size), np.uint8)
                m[y0:y0 + 10, x0:x0 + 12] = 1
                anns.append({"id": aid, "image_id": i + 1,
                             "category_id": (i + j) % 2 + 1,
                             "bbox": [x0, y0, 12, 10], "area": 120.0,
                             "iscrowd": 0,
                             "segmentation": rle_mod.encode_mask(m)})
                aid += 1
        with open(root / "annotations" / f"instances_{split}.json", "w") as f:
            json.dump({"images": imgs, "annotations": anns,
                       "categories": cats}, f)
    return root


def test_eda_synthetic(tmp_path):
    out = tmp_path / "eda"
    _run(["examples/eda_olive_diseases.py", "--synthetic",
          "--out-dir", str(out)])
    for f in ("class_distribution.png", "images_per_class.png",
              "image_resolutions.png", "bbox_stats.png",
              "thesis_class_stats.png", "thesis_class_stats.csv"):
        assert (out / f).exists(), f


def test_eda_on_real_format(tmp_path):
    root = _toy_dataset(tmp_path / "ds")
    out = tmp_path / "eda"
    stdout = _run(["examples/eda_olive_diseases.py", "--dataset-root",
                   str(root), "--out-dir", str(out)])
    assert "train2017: 6 images" in stdout
    assert (out / "samples_train2017.png").exists()


def test_visualize_olive_dataset(tmp_path):
    root = _toy_dataset(tmp_path / "ds")
    out = tmp_path / "vis"
    _run(["examples/visualize_olive_dataset.py", "--dataset-root", str(root),
          "--split", "val2017", "--n", "2", "--out-dir", str(out)])
    assert len(list(out.glob("gt_val2017_*.png"))) == 2


def test_visualize_grid_points(tmp_path):
    out = tmp_path / "grid.png"
    stdout = _run(["examples/visualize_grid_points.py",
                   "--points-per-side", "8", "--out", str(out)])
    assert "64 grid points" in stdout
    assert out.exists()


def test_olive_results_analysis(tmp_path):
    root = _toy_dataset(tmp_path / "ds")
    gt = root / "annotations" / "instances_val2017.json"
    with open(gt) as f:
        data = json.load(f)
    # two fake runs: dinov2_1shot (GT-perfect) and dinov2_10shot
    wd = tmp_path / "work_dirs"
    for run in ("dinov2_1shot", "dinov2_10shot"):
        rd = wd / run
        rd.mkdir(parents=True)
        dets = [{"image_id": a["image_id"], "category_id": a["category_id"],
                 "bbox": a["bbox"], "score": 0.9,
                 "segmentation": a["segmentation"]}
                for a in data["annotations"]]
        with open(rd / "results.json", "w") as f:
            json.dump(dets, f)
    out = tmp_path / "report"
    stdout = _run(["examples/olive_results_analysis.py", "--work-dirs",
                   str(wd), "--gt", str(gt), "--img-dir",
                   str(root / "val2017"), "--out-dir", str(out),
                   "--qualitative-n", "1"])
    assert "dinov2  10-shot" in stdout.replace("   ", " ") or \
        "dinov2" in stdout
    assert (out / "results_table.csv").exists()
    assert (out / "trend_bbox_AP.png").exists()
    assert len(list(out.glob("qual_*.png"))) == 1
    # GT-as-prediction runs must score AP = 1.0
    rows = (out / "results_table.csv").read_text().splitlines()
    assert any(",1.0" in r for r in rows[1:])


def test_sam3_fsl_oracle(tmp_path):
    root = _toy_dataset(tmp_path / "ds")
    # support pkl in the sampler's schema: {cat_id: [{img_id, ann_ids}, ...]}
    import pickle
    with open(root / "annotations" / "instances_train2017.json") as f:
        tr = json.load(f)
    support = {}
    for a in tr["annotations"][:4]:
        support.setdefault(a["category_id"], []).append(
            {"img_id": a["image_id"], "ann_ids": [a["id"]]})
    pkl = tmp_path / "support.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(support, f)
    out = tmp_path / "out" / "results.json"
    stdout = _run(["examples/sam3_fsl_eval.py", "--dataset-root", str(root),
                   "--support-pkl", str(pkl), "--backend", "oracle",
                   "--out", str(out)])
    assert out.exists()
    assert "COCO segm mAP" in stdout
    assert "mIoU" in stdout or "miou" in stdout.lower()
    # oracle predictions are the GT -> AP must be 1.0
    assert "= 1.000" in stdout or "1.00" in stdout


def test_inst_to_segm_img_ids_and_overwrite(tmp_path):
    """img_ids restriction + reference paint-order semantics (descending
    score, later paint wins) for coco_inst_to_segm_eval."""
    from no_time_to_train_tpu.data.converters import coco_inst_to_segm_eval
    m1 = np.zeros((16, 16), np.uint8); m1[:8] = 1
    m2 = np.zeros((16, 16), np.uint8); m2[4:12] = 1
    gt = {"images": [{"id": 1, "height": 16, "width": 16,
                      "file_name": "a.png"},
                     {"id": 2, "height": 16, "width": 16,
                      "file_name": "b.png"}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
               "bbox": [0, 0, 16, 8], "area": 128.0,
               "segmentation": rle_mod.encode_mask(m1)},
              {"id": 2, "image_id": 2, "category_id": 2, "iscrowd": 0,
               "bbox": [0, 4, 16, 8], "area": 128.0,
               "segmentation": rle_mod.encode_mask(m2)}],
          "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    gp = tmp_path / "gt.json"; gp.write_text(json.dumps(gt))
    preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
              "segmentation": rle_mod.encode_mask(m1)},
             # overlapping lower-score pred of class 2 on image 1: painted
             # AFTER the 0.9 one, so it wins the overlap rows 4..8
             {"image_id": 1, "category_id": 2, "score": 0.6,
              "segmentation": rle_mod.encode_mask(m2)}]
    pp = tmp_path / "pred.json"; pp.write_text(json.dumps(preds))
    out = coco_inst_to_segm_eval(str(gp), str(pp), img_ids=[1])
    # image 2 excluded; on image 1: pred map = cls1 rows 0..4, cls2 rows 4..12
    # gt map = cls1 rows 0..8 -> cls1 IoU = 4/8 rows = 0.5, cls2 IoU = 0
    assert abs(out["per_class_iou"][1] - 0.5) < 1e-9
    assert out["per_class_iou"][2] == 0.0
