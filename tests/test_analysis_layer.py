"""The offline analysis layer: oracle scalars/triplets dumps + online_vis in
the runner, the analysis scripts, the NTTT/SAM3 aggregation CSV, and the
video-framed few-shot harness (sam2_video backend) — all on the synthetic
dataset."""
import json
import os
import pickle
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

sys.path.insert(0, "/root/repo")

from tests.test_cli import _make_dataset  # synthetic COCO fixture


def _tiny_presets():
    from no_time_to_train_tpu.config import presets
    from no_time_to_train_tpu.config.presets import Sam2Config
    presets.SAM2_PRESETS.setdefault("sam2_tiny_test.yaml", Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=128))
    presets.ENCODER_PRESETS.setdefault(
        "dino_tiny_test",
        presets.EncoderConfig("dino_tiny_test", 28, 14, 32, 1, 2, "local"))


def _runner(tmp_path, rng, img_dir, json_path, **model_extra):
    from no_time_to_train_tpu.runner import MatcherRunner
    model_cfg = {
        "name": "matching_baseline_noAMG",
        "sam2_cfg_file": "sam2_tiny_test.yaml",
        "sam2_infer_cfgs": {"points_per_side": 4, "testing_point_bs": 8,
                            "iou_thr": 0.0, "nms_thr": 0.5,
                            "num_out_instance": 5, "kmeans_k": 2,
                            "n_pca_components": 2, "cls_num_per_mask": 1},
        "encoder_cfg": {"name": "dino_tiny_test"},
        "memory_bank_cfg": {"enable": True, "category_num": 1, "length": 2},
    }
    model_cfg.update(model_extra)
    dataset_cfgs = {
        "fill_memory": {"name": "coco", "root": img_dir,
                        "json_file": json_path,
                        "memory_pkl": str(tmp_path / "memory.pkl"),
                        "image_size": 28, "memory_length": 2,
                        "context_ratio": 0.2, "norm_img": False,
                        "cat_names": ["person"]},
        "test": {"name": "coco", "root": img_dir, "json_file": json_path,
                 "image_size": 128, "norm_img": False,
                 "cat_names": ["person"]},
    }
    return MatcherRunner(model_cfg, dataset_cfgs, test_mode="test",
                         save_dir=str(tmp_path))


@pytest.fixture(scope="module")
def analysis_run(tmp_path_factory):
    """One full fill -> postprocess -> test run with online_vis on, shared
    by the assertions below (the tiny pipeline still costs ~20s)."""
    tmp_path = tmp_path_factory.mktemp("analysis")
    rng = np.random.default_rng(0)
    _tiny_presets()
    from no_time_to_train_tpu.data.few_shot_sampling import (
        sample_memory_dataset)
    img_dir, json_path = _make_dataset(tmp_path, rng)
    sample_memory_dataset(json_path, str(tmp_path / "memory.pkl"),
                          memory_length=2, remove_bad=False, seed=0)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r = _runner(tmp_path, rng, img_dir, json_path, online_vis=True)
        r.test_mode = "fill_memory"
        r.run(out_path=str(tmp_path / "m.ckpt"))
        r.test_mode = "postprocess_memory"
        r.run(ckpt_path=str(tmp_path / "m.ckpt"),
              out_path=str(tmp_path / "mp.ckpt"))
        r.test_mode = "test"
        r.run(ckpt_path=str(tmp_path / "mp.ckpt"),
              export_result=str(tmp_path / "preds.json"))
    finally:
        os.chdir(cwd)
    return tmp_path, img_dir, json_path


def test_scalar_and_triplet_dumps(analysis_run):
    tmp_path, _, _ = analysis_run
    with open(tmp_path / "scalars_all.pkl", "rb") as f:
        scalars = pickle.load(f)
    with open(tmp_path / "triplets_all.pkl", "rb") as f:
        triplets = pickle.load(f)
    s = np.concatenate(scalars, axis=0)
    t = np.concatenate(triplets, axis=0)
    assert s.shape[1] == 4 and t.shape[1] == 3
    # oracle IoU from the Oracle dataset's GT (tiny model runs with random
    # weights here, so only the structure is assertable: finite, in [0,1],
    # and some prediction overlaps the big GT square at least slightly)
    assert np.isfinite(s[:, 2]).all()
    assert (s[:, 2] >= 0).all() and (s[:, 2] <= 1).all()
    assert s[:, 2].max() > 0.0
    # triplet sim column == scalars sim column
    np.testing.assert_allclose(t[:, 0], s[:, 0])


def test_online_vis_panels(analysis_run):
    tmp_path, _, _ = analysis_run
    vis_dir = tmp_path / "results_analysis" / "coco"
    panels = list(vis_dir.glob("*.png"))
    assert len(panels) == 3, f"expected 3 GT-vs-pred panels, got {panels}"
    im = Image.open(panels[0])
    assert im.size[0] > im.size[1]  # side-by-side canvas


def test_analysis_scripts_run(analysis_run, monkeypatch):
    tmp_path, _, _ = analysis_run
    out_dir = str(tmp_path / "figs")
    from tools.analysis_scripts import (sim_predIoU_oracleIoU,
                                        scores_by_class, pos_neg_by_class,
                                        pcaScore_oracleIoU,
                                        local_global_corre,
                                        local_global_oracleIoU)
    monkeypatch.setattr(sys, "argv", [
        "x", "--triplets", str(tmp_path / "triplets_all.pkl"),
        "--out_dir", out_dir])
    sim_predIoU_oracleIoU.main()
    assert os.path.exists(os.path.join(out_dir, "sam2_matching_analysis.png"))
    for mod, fig, per_class in (
            (scores_by_class, "avgSim_0_person.png", True),
            (pos_neg_by_class, "score_hist_allClasses.png", True),
            (pcaScore_oracleIoU, "pcaScore_oracleIoU.png", False),
            (local_global_corre, "local_global_corre.png", False),
            (local_global_oracleIoU, "local_global_oracleIoU.png", False)):
        argv = ["x", "--scalars", str(tmp_path / "scalars_all.pkl"),
                "--out_dir", out_dir]
        if per_class:
            argv += ["--classes", "person"]
        monkeypatch.setattr(sys, "argv", argv)
        mod.main()
        assert os.path.exists(os.path.join(out_dir, fig)), fig


def test_aggregate_nttt_sam3_csv(analysis_run, monkeypatch, tmp_path):
    run_root = tmp_path / "agg"
    src, img_dir, json_path = analysis_run
    run_dir = run_root / "dinov2_large_2shot_seed42"
    run_dir.mkdir(parents=True)
    preds = json.loads((src / "preds.json").read_text())
    (run_dir / "nttt_predictions.json").write_text(json.dumps(preds))
    (run_dir / "nttt_runtime.json").write_text(
        json.dumps({"fps": 3.2, "peak_vram_mib": 1000.0}))
    (run_dir / "sam3_predictions.json").write_text(json.dumps([]))

    import importlib
    agg = importlib.import_module("scripts.aggregate_nttt_sam3_metrics")
    out_csv = str(run_root / "metrics_summary.csv")
    monkeypatch.setattr(sys, "argv", [
        "x", "--root_dir", str(run_root), "--gt_json", json_path,
        "--out_csv", out_csv])
    agg.main()
    import csv
    rows = list(csv.DictReader(open(out_csv)))
    assert len(rows) == 2   # NTTT + (empty) SAM3
    nttt = [r for r in rows if r["model"] == "NTTT"][0]
    assert float(nttt["fps"]) == 3.2
    assert 0.0 <= float(nttt["bbox_AP"]) <= 1.0
    sam3 = [r for r in rows if r["model"] == "SAM3"][0]
    assert sam3["num_predictions"] == "0"


def test_video_fewshot_harness_sam2_backend(tmp_path, rng, monkeypatch):
    """eval_sam3_video_olive --backend sam2_video end-to-end on synthetic
    data with the tiny SAM2 (random weights: exercises plumbing, writes
    predictions + runtime json)."""
    _tiny_presets()
    img_dir, json_path = _make_dataset(tmp_path, rng)
    # layout expected by the harness
    droot = tmp_path / "data"
    (droot / "annotations").mkdir(parents=True)
    os.symlink(img_dir, droot / "train2017")
    os.symlink(img_dir, droot / "val2017")
    ann = json.loads(open(json_path).read())
    (droot / "annotations" / "instances_train2017.json").write_text(
        json.dumps(ann))
    (droot / "annotations" / "instances_val2017.json").write_text(
        json.dumps(ann))

    import importlib
    mod = importlib.import_module("scripts.eval_sam3_video_olive")
    out_dir = str(tmp_path / "out")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        monkeypatch.setattr(sys, "argv", [
            "x", "--shots", "1", "--seed", "0",
            "--backend", "sam2_video",
            "--data_root", str(droot), "--class_split", "default_classes",
            "--image_size", "128", "--sam2_cfg", "sam2_tiny_test.yaml",
            "--output_dir", out_dir, "--max_queries", "2",
            "--evaluate_coco"])
        mod.main()
    finally:
        os.chdir(cwd)
    preds = json.loads(open(os.path.join(
        out_dir, "sam3_predictions.json")).read())
    runtime = json.loads(open(os.path.join(
        out_dir, "sam3_runtime.json")).read())
    assert runtime["num_queries"] == 2 and runtime["fps"] > 0
    for p in preds:
        assert set(p) >= {"image_id", "category_id", "bbox", "score",
                          "segmentation"}
