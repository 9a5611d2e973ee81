"""CLI surface test: the three reference phases via run_lightning.py main()
with a reference-format YAML config + dotted overrides, on the synthetic
dataset."""
import json
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

sys.path.insert(0, "/root/repo")


def _make_dataset(tmp_path, rng):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(3):
        h, w = 80, 96
        arr = (rng.random((h, w, 3)) * 60).astype(np.uint8)
        y0, x0 = 10, 14 + 4 * i
        arr[y0:y0 + 48, x0:x0 + 48] = [210, 60, 60]
        Image.fromarray(arr).save(img_dir / f"{i:04d}.png")
        images.append({"id": i + 1, "height": h, "width": w,
                       "file_name": f"{i:04d}.png"})
        poly = [x0, y0, x0 + 48, y0, x0 + 48, y0 + 48, x0, y0 + 48]
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                            "bbox": [x0, y0, 48, 48], "area": 48 * 48.0,
                            "iscrowd": 0, "segmentation": [poly]})
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}]}
    json_path = tmp_path / "ann.json"
    json_path.write_text(json.dumps(data))
    return str(img_dir), str(json_path)


def test_cli_three_phases(tmp_path, rng, capsys, monkeypatch):
    import run_lightning
    from no_time_to_train_tpu.data.few_shot_sampling import sample_memory_dataset
    from no_time_to_train_tpu.config import presets
    from no_time_to_train_tpu.config.presets import Sam2Config

    # register a tiny SAM2 preset so the CLI path stays fast on CPU
    presets.SAM2_PRESETS["sam2_tiny_test.yaml"] = Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=128)
    presets.ENCODER_PRESETS["dino_tiny_test"] = presets.EncoderConfig(
        "dino_tiny_test", 28, 14, 32, 1, 2, "local")

    img_dir, json_path = _make_dataset(tmp_path, rng)
    pkl_path = str(tmp_path / "memory.pkl")
    sample_memory_dataset(json_path, pkl_path, memory_length=2,
                          remove_bad=False, seed=0)

    cfg = {
        "seed_everything": 42,
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
                             "norm_img": False, "cat_names": ["person"]},
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
    out = capsys.readouterr().out
    assert "FPS:" in out
    assert "Average Precision" in out
    results = json.loads(open(export).read())
    assert all(r["category_id"] == 1 for r in results)


def test_cli_dotted_override_parsing():
    import run_lightning
    args, overrides = run_lightning.parse_args(
        ["test", "--config", "c.yaml", "--model.test_mode", "test",
         "--model.init_args.model_cfg.sam2_infer_cfgs.iou_thr=0.3",
         "--ckpt_path", "x.ckpt"])
    assert args["config"] == "c.yaml"
    assert args["ckpt_path"] == "x.ckpt"
    assert ("model.test_mode", "test") in overrides
    assert ("model.init_args.model_cfg.sam2_infer_cfgs.iou_thr", 0.3) in overrides


def test_cli_negative_phases(tmp_path, rng):
    """fill_memory_neg + postprocess_memory_neg + test with negative refs."""
    import run_lightning
    from no_time_to_train_tpu.data.few_shot_sampling import sample_memory_dataset
    from no_time_to_train_tpu.config import presets
    from no_time_to_train_tpu.config.presets import Sam2Config

    presets.SAM2_PRESETS.setdefault("sam2_tiny_test.yaml", Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=128))
    presets.ENCODER_PRESETS.setdefault(
        "dino_tiny_test", presets.EncoderConfig("dino_tiny_test", 28, 14, 32,
                                                1, 2, "local"))

    img_dir, json_path = _make_dataset(tmp_path, rng)
    pkl = str(tmp_path / "m.pkl")
    neg_pkl = str(tmp_path / "neg.pkl")
    sample_memory_dataset(json_path, pkl, 2, remove_bad=False, seed=0)
    sample_memory_dataset(json_path, neg_pkl, 2, remove_bad=False, seed=1)

    cfg = {
        "seed_everything": 42,
        "model": {"init_args": {
            "model_cfg": {
                "name": "matching_baseline_noAMG",
                "sam2_cfg_file": "sam2_tiny_test.yaml",
                "sam2_infer_cfgs": {"points_per_side": 4,
                                    "testing_point_bs": 8, "iou_thr": 0.0,
                                    "nms_thr": 0.5, "num_out_instance": 5,
                                    "kmeans_k": 2, "n_pca_components": 2,
                                    "cls_num_per_mask": 1,
                                    "with_negative_refs": True},
                "encoder_cfg": {"name": "dino_tiny_test"},
                "memory_bank_cfg": {"enable": True, "category_num": 1,
                                    "length": 2, "length_negative": 2}},
            "dataset_cfgs": {
                "fill_memory": {"name": "coco", "root": img_dir,
                                "json_file": json_path, "memory_pkl": pkl,
                                "image_size": 28, "memory_length": 2,
                                "context_ratio": 0.2, "norm_img": False,
                                "cat_names": ["person"]},
                "support": {"name": "coco", "root": img_dir,
                            "json_file": json_path, "image_size": 128,
                            "norm_img": False, "cat_names": ["person"]},
                "test": {"name": "coco", "root": img_dir,
                         "json_file": json_path, "image_size": 128,
                         "norm_img": False, "cat_names": ["person"]}},
            "data_load_cfgs": {"workers": 0}}},
        "trainer": {"devices": 1},
    }
    cfg_path = tmp_path / "cfg_neg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    m1 = str(tmp_path / "m1.ckpt")
    m2 = str(tmp_path / "m2.ckpt")
    m3 = str(tmp_path / "m3.ckpt")
    m4 = str(tmp_path / "m4.ckpt")

    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "fill_memory",
                        "--out_path", m1])
    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "postprocess_memory",
                        "--ckpt_path", m1, "--out_path", m2])
    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "fill_memory_neg",
                        "--ckpt_path", m2, "--out_path", m3,
                        "--out_neg_pkl", neg_pkl,
                        "--out_neg_json", json_path])
    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "postprocess_memory_neg",
                        "--ckpt_path", m3, "--out_path", m4])
    run_lightning.main(["test", "--config", str(cfg_path),
                        "--model.test_mode", "test", "--ckpt_path", m4])

    # banks persisted through all phases
    from no_time_to_train_tpu.utils.checkpoint import load_memory_bank
    from no_time_to_train_tpu.models.matching import memory_bank as mbx
    gs = 2
    b = mbx.create(1, 2, gs * gs, 32, 2, 2)
    bn = mbx.create(1, 2, gs * gs, 32, 2, 2)
    b, bn = load_memory_bank(m4, b, bn)
    assert bool(b.postprocessed) and bool(bn.postprocessed)
    assert int(np.asarray(bn.fill_counts).sum()) == 2
