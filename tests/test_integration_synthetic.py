"""Full-system smoke test on a synthetic COCO dataset: sample references ->
fill memory -> postprocess -> test -> encode -> COCO eval. Random weights (no
torch needed) — validates the data flow, shapes, and eval plumbing."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from no_time_to_train_tpu.config.presets import Sam2Config, EncoderConfig
from no_time_to_train_tpu.data.coco_api import rasterize_polygons
from no_time_to_train_tpu.data.datasets import (COCOMemoryFillCropDataset,
                                                COCORefTestDataset)
from no_time_to_train_tpu.data.few_shot_sampling import sample_memory_dataset
from no_time_to_train_tpu.models.matching.pipeline import (NoAMGMatcher,
                                                           MatchingConfig,
                                                           finalize_results)

SAM_IMG = 128
N_IMGS = 4


def _make_dataset(tmp_path, rng):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations, next_ann = [], [], 1
    for i in range(N_IMGS):
        h, w = 96, 112
        arr = (rng.random((h, w, 3)) * 80).astype(np.uint8)
        # one bright square 'person', one dark circle-ish 'car'
        y0, x0 = 12 + (i % 2) * 8, 16 + (i % 2) * 10
        arr[y0:y0 + 50, x0:x0 + 50] = [220, 40, 40]
        Image.fromarray(arr).save(img_dir / f"{i:04d}.png")
        images.append({"id": i + 1, "height": h, "width": w,
                       "file_name": f"{i:04d}.png"})
        poly = [x0, y0, x0 + 50, y0, x0 + 50, y0 + 50, x0, y0 + 50]
        annotations.append({
            "id": next_ann, "image_id": i + 1, "category_id": 1,
            "bbox": [x0, y0, 50, 50], "area": 2500.0, "iscrowd": 0,
            "segmentation": [poly]})
        next_ann += 1
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person"},
                           {"id": 2, "name": "car"}]}
    json_path = tmp_path / "ann.json"
    json_path.write_text(json.dumps(data))
    return str(img_dir), str(json_path)


def test_synthetic_full_loop(tmp_path, rng):
    img_dir, json_path = _make_dataset(tmp_path, rng)
    pkl_path = str(tmp_path / "memory.pkl")
    sample_memory_dataset(json_path, pkl_path, memory_length=2,
                          remove_bad=False, dataset="coco", seed=0)

    fill_ds = COCOMemoryFillCropDataset(
        root=img_dir, json_file=json_path, memory_pkl=pkl_path,
        image_size=28, memory_length=2, context_ratio=0.2, norm_img=False,
        cat_names=["person"])
    assert len(fill_ds) == 2

    sam_cfg = Sam2Config(
        embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
        global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(2, 2),
        window_spec=(4, 2, 4, 2), backbone_channel_list=(256, 128, 64, 32),
        image_size=SAM_IMG)
    enc_cfg = EncoderConfig("tiny", 28, 14, 32, 1, 2, "local")
    mcfg = MatchingConfig(points_per_side=4, testing_point_bs=8, iou_thr=0.0,
                          nms_thr=0.5, num_out_instance=5, analysis_res=128,
                          expand_ratio=2)
    matcher = NoAMGMatcher(sam_cfg, enc_cfg, mcfg, n_classes=1,
                           memory_length=2)

    for item in [fill_ds[i] for i in range(len(fill_ds))]:
        matcher.fill_memory(item["img"][None], item["mask"][None],
                            [item["cat_ind"]])
    assert int(matcher.bank.fill_counts[0]) == 2
    matcher.postprocess_memory()

    test_ds = COCORefTestDataset(root=img_dir, json_file=json_path,
                                 image_size=SAM_IMG, norm_img=False,
                                 cat_names=["person"])
    outputs = []
    for i in range(len(test_ds)):
        item = test_ds[i]
        raw = matcher.test(item["target_img"])
        fin = finalize_results(raw, item["target_img_info"]["ori_height"],
                               item["target_img_info"]["ori_width"])
        outputs.append(dict(img_id=item["target_img_info"]["id"],
                            scores=fin["scores"], labels=fin["labels"],
                            boxes=fin["bboxes"], masks=fin["binary_masks"]))

    results = test_ds.encode_results(outputs)
    assert all(r["category_id"] == 1 for r in results)
    stats = test_ds.evaluate(results)
    assert stats is not None and "bbox" in stats and "segm" in stats
    # random weights -> no accuracy expectation; just structural sanity
    assert stats["bbox"].shape == (12,)
