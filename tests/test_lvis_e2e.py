"""LVIS end-to-end: an LVIS-shaped json (coco_url image entries, frequency-
bucketed categories, neg/not-exhaustive image annotations) driven through the
full CLI pipeline — lvis_add_filename converter -> fill/postprocess/test via
run_lightning.main -> exported results -> LVISEval (maxDets 300, APr/APc/APf)
— mirroring scripts/lvis_pipeline.sh (reference scripts/matching_lvis*.sh +
the external `lvis` package eval)."""
import json

import numpy as np
import pytest
import yaml
from PIL import Image


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _make_lvis_dataset(tmp_path, rng):
    """LVIS quirks: images carry coco_url (no file_name), per-image
    neg_category_ids / not_exhaustive_category_ids, categories carry
    frequency buckets."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(3):
        h, w = 80, 96
        arr = (rng.random((h, w, 3)) * 60).astype(np.uint8)
        y0, x0 = 10, 14 + 4 * i
        arr[y0:y0 + 48, x0:x0 + 48] = [210, 60, 60]
        Image.fromarray(arr).save(img_dir / f"{i + 1:012d}.jpg")
        images.append({
            "id": i + 1, "height": h, "width": w,
            "coco_url": f"http://images.cocodataset.org/val2017/"
                        f"{i + 1:012d}.jpg",
            "neg_category_ids": [2] if i == 0 else [],
            "not_exhaustive_category_ids": [1] if i == 2 else [],
        })
        poly = [x0, y0, x0 + 48, y0, x0 + 48, y0 + 48, x0, y0 + 48]
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                            "bbox": [x0, y0, 48, 48], "area": 48 * 48.0,
                            "segmentation": [poly]})
    data = {"images": images, "annotations": annotations,
            "categories": [
                {"id": 1, "name": "person", "frequency": "c"},
                {"id": 2, "name": "airplane", "frequency": "r"}]}
    json_path = tmp_path / "lvis_raw.json"
    json_path.write_text(json.dumps(data))
    return str(img_dir), str(json_path)


def test_lvis_pipeline_e2e(tmp_path, rng, capsys):
    import run_lightning
    from no_time_to_train_tpu.config import presets
    from no_time_to_train_tpu.config.presets import Sam2Config
    from no_time_to_train_tpu.data.converters import lvis_add_filename
    from no_time_to_train_tpu.data.few_shot_sampling import (
        sample_memory_dataset)

    presets.SAM2_PRESETS.setdefault("sam2_tiny_test.yaml", Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=128))
    presets.ENCODER_PRESETS.setdefault(
        "dino_tiny_test",
        presets.EncoderConfig("dino_tiny_test", 28, 14, 32, 1, 2, "local"))

    img_dir, raw_json = _make_lvis_dataset(tmp_path, rng)
    # step 1: the filename fixer every LVIS run starts with
    json_path = str(tmp_path / "lvis_fixed.json")
    fixed = lvis_add_filename(raw_json, json_path)
    assert fixed["images"][0]["file_name"] == "000000000001.jpg"

    pkl_path = str(tmp_path / "memory.pkl")
    sample_memory_dataset(json_path, pkl_path, memory_length=2,
                          remove_bad=False, seed=0)

    cfg = {
        "model": {
            "class_path": "no_time_to_train.pl_wrapper.sam2matcher_pl."
                          "Sam2MatcherLightningModel",
            "init_args": {
                "model_cfg": {
                    "name": "matching_baseline_noAMG",
                    "sam2_cfg_file": "sam2_tiny_test.yaml",
                    "sam2_ckpt_path": None,
                    "sam2_infer_cfgs": {
                        "points_per_side": 4, "testing_point_bs": 8,
                        "iou_thr": 0.0, "nms_thr": 0.5,
                        "num_out_instance": 5, "kmeans_k": 2,
                        "n_pca_components": 2, "cls_num_per_mask": 1},
                    "encoder_cfg": {"name": "dino_tiny_test"},
                    "encoder_ckpt_path": None,
                    "memory_bank_cfg": {"enable": True, "category_num": 1,
                                        "length": 2},
                },
                "dataset_cfgs": {
                    "fill_memory": {"name": "coco", "root": img_dir,
                                    "json_file": json_path,
                                    "memory_pkl": pkl_path,
                                    "image_size": 28, "memory_length": 2,
                                    "context_ratio": 0.2, "norm_img": False,
                                    "cat_names": ["person"]},
                    "test": {"name": "coco", "root": img_dir,
                             "json_file": json_path, "image_size": 128,
                             "norm_img": False,
                             "cat_names": ["person"]},
                },
                "data_load_cfgs": {"workers": 0},
            },
        },
        "trainer": {"devices": 1},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    mem_ckpt = str(tmp_path / "memory.ckpt")
    post_ckpt = str(tmp_path / "memory_post.ckpt")
    export = str(tmp_path / "results.json")

    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "fill_memory",
                        "--out_path", mem_ckpt])
    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "postprocess_memory",
                        "--ckpt_path", mem_ckpt, "--out_path", post_ckpt])
    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "test",
                        "--ckpt_path", post_ckpt,
                        "--export_result", export])
    results = json.loads(open(export).read())
    assert results, "no detections exported"
    assert all(r["category_id"] == 1 for r in results)

    # step 3: LVIS eval on the export, via the pipeline's CLI entry
    from no_time_to_train_tpu.data import lvis_eval
    stats = lvis_eval.main(["--gt", json_path, "--results", export,
                            "--iou-type", "segm"])
    out = capsys.readouterr().out
    assert "APr" in out and "APc" in out and "APf" in out
    assert set(stats) >= {"AP", "APr", "APc", "APf"}
    # class 1 is bucket "c"; no rare-class detections exist
    assert stats["APr"] == -1.0 or stats["APr"] >= 0.0
    assert stats["AP"] >= 0.0


def test_lvis_eval_cli_maxdets(tmp_path):
    """LVISEval via the CLI keeps maxDets=300 (not COCO's 100)."""
    from no_time_to_train_tpu.data.coco_api import COCO
    from no_time_to_train_tpu.data.lvis_eval import LVISEval
    gt = {"images": [{"id": 1, "height": 32, "width": 32,
                      "neg_category_ids": [],
                      "not_exhaustive_category_ids": []}],
          "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                           "bbox": [4, 4, 8, 8], "area": 64.0,
                           "segmentation": [[4, 4, 12, 4, 12, 12, 4, 12]]}],
          "categories": [{"id": 1, "name": "x", "frequency": "f"}]}
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))
    coco = COCO(str(p))
    dt = coco.loadRes([{"image_id": 1, "category_id": 1,
                        "bbox": [4, 4, 8, 8], "score": 0.9}])
    ev = LVISEval(coco, dt, "bbox")
    assert ev.params.maxDets == [300]
    ev.evaluate(); ev.accumulate()
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
