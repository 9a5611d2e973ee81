"""Converters + visualization smoke tests."""
import json

import numpy as np
import pytest
from PIL import Image

from no_time_to_train_tpu.data import converters, rle as rle_mod


def _toy_coco(tmp_path, n_imgs=3, per_img=2):
    images, anns = [], []
    aid = 1
    for i in range(n_imgs):
        images.append({"id": i + 1, "height": 32, "width": 32,
                       "file_name": f"{i}.png"})
        for j in range(per_img):
            seg = rle_mod.encode_mask(
                np.pad(np.ones((8, 8), np.uint8),
                       ((4 + j, 20 - j), (4, 20))))
            anns.append({"id": aid, "image_id": i + 1, "category_id": 1,
                         "bbox": [4, 4 + j, 8, 8], "area": 64.0,
                         "iscrowd": 0, "segmentation": seg})
            aid += 1
    data = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "person"}]}
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(data))
    return str(p), data


def test_coco_to_pkl(tmp_path):
    p, data = _toy_coco(tmp_path)
    out = converters.coco_to_pkl(p, str(tmp_path / "m.pkl"),
                                 target_examples=10)
    assert 1 in out
    assert len(out[1]) >= 10


def test_sample_sub_dataset(tmp_path):
    p, data = _toy_coco(tmp_path, n_imgs=5)
    out = converters.sample_sub_dataset(p, str(tmp_path / "sub.json"), 2)
    assert len(out["images"]) == 2
    ids = {im["id"] for im in out["images"]}
    assert all(a["image_id"] in ids for a in out["annotations"])


def test_lvis_add_filename(tmp_path):
    data = {"images": [{"id": 1, "coco_url":
                        "http://images.cocodataset.org/val2017/000123.jpg"}],
            "annotations": [], "categories": []}
    p = tmp_path / "l.json"
    p.write_text(json.dumps(data))
    out = converters.lvis_add_filename(str(p), str(tmp_path / "o.json"))
    assert out["images"][0]["file_name"] == "000123.jpg"


def test_inst_to_segm_eval(tmp_path):
    p, data = _toy_coco(tmp_path, n_imgs=1, per_img=1)
    preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
              "segmentation": data["annotations"][0]["segmentation"]}]
    pp = tmp_path / "pred.json"
    pp.write_text(json.dumps(preds))
    out = converters.coco_inst_to_segm_eval(p, str(pp))
    assert abs(out["miou"] - 1.0) < 1e-9


def test_inst_to_segm_eval_skips_crowd_gt(tmp_path):
    """Crowd GTs are excluded from the semantic GT map (reference
    COCOInstToSegmEvaluator:82; ADVICE r2). A crowd-only region must count
    as background, so a matching prediction there HURTS the IoU."""
    p, data = _toy_coco(tmp_path, n_imgs=1, per_img=1)
    crowd_seg = rle_mod.encode_mask(
        np.pad(np.ones((8, 8), np.uint8), ((20, 4), (20, 4))))
    data["annotations"].append(
        {"id": 99, "image_id": 1, "category_id": 1, "bbox": [20, 20, 8, 8],
         "area": 64.0, "iscrowd": 1, "segmentation": crowd_seg})
    p2 = tmp_path / "gt_crowd.json"
    p2.write_text(json.dumps(data))
    preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
              "segmentation": data["annotations"][0]["segmentation"]},
             {"image_id": 1, "category_id": 1, "score": 0.8,
              "segmentation": crowd_seg}]
    pp = tmp_path / "pred_crowd.json"
    pp.write_text(json.dumps(preds))
    out = converters.coco_inst_to_segm_eval(str(p2), str(pp))
    # pred covers GT (64 px inter) + the ignored crowd region (64 px union
    # only): IoU = 64 / 128
    assert abs(out["miou"] - 0.5) < 1e-9


def test_inst_to_segm_eval_replicate_reference_bug(tmp_path):
    """replicate_reference_bug=True scores the oracle's indexing verbatim
    (0-based full-list enumerate positions over range(N),
    coco_inst_to_segm.py:27-29,:107). With 2 full categories and a split of
    only the SECOND one, the split class paints index 1 but the oracle
    scores indices {0, 1}: index 0 is background-vs-background (union 0,
    skipped) and index 1 is the real class — so a perfect prediction still
    scores 1.0 here, while a split of the FIRST category paints index 0,
    conflating it with background (IoU < 1 on any image with background)."""
    p, data = _toy_coco(tmp_path, n_imgs=1, per_img=1)
    data["categories"] = [{"id": 1, "name": "person"},
                          {"id": 2, "name": "dog"}]
    seg = data["annotations"][0]["segmentation"]
    p2 = tmp_path / "gt2.json"
    p2.write_text(json.dumps(data))
    preds = [{"image_id": 1, "category_id": 1, "score": 0.9,
              "segmentation": seg}]
    pp = tmp_path / "pred.json"
    pp.write_text(json.dumps(preds))

    from no_time_to_train_tpu.data import metainfo
    metainfo.METAINFO["_bugtest_split"] = ["person"]
    try:
        fixed = converters.coco_inst_to_segm_eval(
            str(p2), str(pp), class_split="_bugtest_split")
        assert abs(fixed["miou"] - 1.0) < 1e-9
        # bug mode, perfect pred: "person" is position 0 in the full list ->
        # painted as 0 and conflated with background, but both maps paint
        # identically so index 0 still matches exactly
        buggy = converters.coco_inst_to_segm_eval(
            str(p2), str(pp), class_split="_bugtest_split",
            replicate_reference_bug=True)
        assert abs(buggy["miou"] - 1.0) < 1e-9
        # EMPTY prediction set exposes the conflation: the fixed scorer gives
        # IoU 0 for the missed class; in bug mode painting index 0 is a NO-OP
        # on the zero-initialized maps, so gt and pred maps are both all-zero
        # and the completely-missed class scores a perfect 1.0
        pe = tmp_path / "pred_empty.json"
        pe.write_text(json.dumps([]))
        fixed0 = converters.coco_inst_to_segm_eval(
            str(p2), str(pe), class_split="_bugtest_split")
        assert abs(fixed0["miou"] - 0.0) < 1e-9
        buggy0 = converters.coco_inst_to_segm_eval(
            str(p2), str(pe), class_split="_bugtest_split",
            replicate_reference_bug=True)
        assert abs(buggy0["miou"] - 1.0) < 1e-9
    finally:
        del metainfo.METAINFO["_bugtest_split"]


def test_pascal_voc_to_coco(tmp_path):
    (tmp_path / "Annotations").mkdir()
    xml = """<annotation><filename>im0.jpg</filename>
      <size><width>100</width><height>80</height><depth>3</depth></size>
      <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>51</xmax><ymax>61</ymax>
        </bndbox></object></annotation>"""
    (tmp_path / "Annotations" / "im0.xml").write_text(xml)
    split = tmp_path / "trainval.txt"
    split.write_text("im0\n")
    out = converters.pascal_voc_to_coco(str(tmp_path), str(split),
                                        str(tmp_path / "voc.json"))
    assert len(out["annotations"]) == 1
    a = out["annotations"][0]
    assert a["bbox"] == [10.0, 20.0, 40.0, 40.0]
    assert out["categories"][a["category_id"] - 1]["name"] == "dog"


def test_vis_coco(tmp_path, rng):
    from no_time_to_train_tpu.data.visualization import vis_coco
    img_path = tmp_path / "img.png"
    Image.fromarray((rng.random((48, 64, 3)) * 255).astype(np.uint8)
                    ).save(img_path)
    masks = rng.random((2, 48, 64)) > 0.7
    out = vis_coco(
        gt_bboxes=[[5, 5, 30, 30]], gt_labels=[0], gt_masks=masks[:1],
        scores=[0.9], labels=[0], bboxes=[[10, 10, 40, 40]],
        masks_pred=masks[1:], score_thr=0.5,
        img_path=str(img_path), out_path=str(tmp_path / "vis.png"),
        show_scores=True, class_names=["person"])
    assert Image.open(out).size == (64 * 2 + 5, 48)


def test_dataset_tools(tmp_path, rng):
    from no_time_to_train_tpu.data import dataset_tools as dt
    p, data = _toy_coco(tmp_path, n_imgs=4, per_img=2)
    assert dt.get_classes(p) == ["person"]

    # custom dataset
    sel = {"reference": {"person": [1, 2]}, "targets": [3, 4]}
    refs, tgts, memory = dt.make_custom_dataset(p, str(tmp_path / "custom"),
                                                sel)
    assert len(memory[1]) == 2
    assert len(tgts["images"]) == 2

    # merge
    merged = dt.merge_coco_datasets([p, p], str(tmp_path / "merged.json"))
    assert len(merged["images"]) == 8
    assert len({im["id"] for im in merged["images"]}) == 8

    # semantic-ref sampling: 2 anns per image -> one entry with both
    out = dt.sample_memory_semantic_ref(p, str(tmp_path / "sem.pkl"), 2)
    assert all(len(e["ann_ids"]) == 2 for e in out[1])


def test_video_loader(tmp_path, rng):
    from no_time_to_train_tpu.data.video_loader import (load_video_frames,
                                                        AsyncVideoFrameLoader)
    for i in range(3):
        Image.fromarray((rng.random((20, 24, 3)) * 255).astype(np.uint8)
                        ).save(tmp_path / f"{i}.jpg")
    frames, oh, ow = load_video_frames(str(tmp_path), image_size=16)
    assert frames.shape == (3, 16, 16, 3) and (oh, ow) == (20, 24)
    loader, _, _ = load_video_frames(str(tmp_path), image_size=16,
                                     async_loading_frames=True)
    assert isinstance(loader, AsyncVideoFrameLoader)
    assert loader[2].shape == (16, 16, 3)


def test_strip_filename_dirs(tmp_path):
    """reference change_filename_pascal.py: file_name -> basename."""
    data = {"images": [{"id": 1, "file_name": "VOC2007/JPEGImages/a.jpg"},
                       {"id": 2, "file_name": "b.jpg"}],
            "annotations": [], "categories": []}
    src = tmp_path / "long.json"
    src.write_text(json.dumps(data))
    dst = tmp_path / "short.json"
    converters.strip_filename_dirs([str(src)], [str(dst)])
    out = json.loads(dst.read_text())
    assert [im["file_name"] for im in out["images"]] == ["a.jpg", "b.jpg"]


def test_coco_zeroshot_split_export(tmp_path):
    """reference cd_vito_paper_coco_zeroshot_categories.py: the six
    ovd_ins_* jsons with seen/unseen filtering + split tags."""
    cats = [{"id": 1, "name": "person"},      # seen
            {"id": 16, "name": "cat"},        # unseen
            {"id": 10, "name": "traffic light"}]  # neither (dropped)
    data = {"images": [{"id": i, "file_name": f"{i}.jpg"} for i in (1, 2, 3)],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1},
                {"id": 2, "image_id": 2, "category_id": 16},
                {"id": 3, "image_id": 3, "category_id": 10}],
            "categories": cats}
    src = tmp_path / "instances.json"
    src.write_text(json.dumps(data))
    out_dir = tmp_path / "ovd"
    names = converters.coco_zeroshot_split_export(str(src), str(src),
                                                  str(out_dir))
    assert len(names) == 6
    b = json.loads((out_dir / "ovd_ins_train2017_b.json").read_text())
    t = json.loads((out_dir / "ovd_ins_val2017_t.json").read_text())
    al = json.loads((out_dir / "ovd_ins_train2017_all.json").read_text())
    assert [c["name"] for c in b["categories"]] == ["person"]
    assert b["categories"][0]["split"] == "seen"
    assert [im["id"] for im in b["images"]] == [1]
    assert [c["name"] for c in t["categories"]] == ["cat"]
    assert t["categories"][0]["split"] == "unseen"
    assert {c["name"] for c in al["categories"]} == {"person", "cat"}
    assert len(al["annotations"]) == 2  # traffic light dropped everywhere


def test_plot_reference_images(tmp_path, rng):
    from tools.make_plots.plot_reference_images import plot_reference_images
    p, data = _toy_coco(tmp_path, n_imgs=3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for im in data["images"]:
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                        ).save(img_dir / im["file_name"])
    out = plot_reference_images(p, str(img_dir), str(tmp_path / "out"))
    assert len(out) == 3
    assert Image.open(out[0]).size == (32 * 2 + 5, 32)
    # gallery restriction (grid_images_plot path)
    out2 = plot_reference_images(p, str(img_dir), str(tmp_path / "out2"),
                                 file_names={"1.png"})
    assert len(out2) == 1 and out2[0].endswith("ref_1.png")
