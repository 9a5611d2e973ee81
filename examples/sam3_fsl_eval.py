#!/usr/bin/env python
"""SAM3 few-shot evaluation via support/query image concatenation.

Port of the reference notebook `sam3-fsl.ipynb`: for each class, the K support
images are resized to a common height and concatenated side-by-side with the
query image; the support GT boxes (shifted into canvas coordinates) prompt
SAM3 as visual exemplars; predicted masks are cropped back to the query strip,
resized to the original query size, RLE-encoded, and scored with COCO segm
mAP plus instance->semantic mIoU — both through this framework's own eval
stack (data/cocoeval.py, data/converters.coco_inst_to_segm_eval).

The geometry/eval harness is fully local; the SAM3 forward is the documented
external path (HuggingFace Sam3Model), gated at import. `--backend oracle`
replaces the model with a GT-oracle (each query's GT masks returned with
score 1.0) so the whole concat -> crop-back -> RLE -> eval loop is testable
without SAM3.

    python examples/sam3_fsl_eval.py --dataset-root data/olive_diseases \
        --support-pkl support_sets_olive/olive_diseases_10shot.pkl \
        --backend oracle --out work_dirs/sam3_fsl/results_10shot.json
"""
import argparse

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import pickle
from pathlib import Path

import numpy as np
from PIL import Image

from no_time_to_train_tpu.data import rle as rle_mod
from no_time_to_train_tpu.data.coco_api import COCO
from no_time_to_train_tpu.data.cocoeval import COCOeval


def concat_images_and_boxes(support_items, query_image, target_h=512):
    """support_items: list of (PIL image, [xyxy boxes]). Returns the concat
    canvas, support boxes in canvas coords, and the query strip's xyxy."""
    resized, shifted = [], []
    cur_x = 0
    for img, boxes in support_items:
        w, h = img.size
        scale = target_h / h
        nw = int(w * scale)
        resized.append(img.resize((nw, target_h), Image.LANCZOS))
        for x1, y1, x2, y2 in boxes:
            shifted.append([x1 * scale + cur_x, y1 * scale,
                            x2 * scale + cur_x, y2 * scale])
        cur_x += nw
    w, h = query_image.size
    scale = target_h / h
    qw = int(w * scale)
    canvas = Image.new("RGB", (cur_x + qw, target_h))
    x = 0
    for img in resized:
        canvas.paste(img, (x, 0))
        x += img.size[0]
    canvas.paste(query_image.resize((qw, target_h), Image.LANCZOS), (x, 0))
    return canvas, shifted, (x, 0, x + qw, target_h)


def crop_back(mask, query_xyxy, orig_wh):
    """Canvas-space mask -> original query resolution (nearest)."""
    qx1, qy1, qx2, qy2 = query_xyxy
    crop = mask[qy1:qy2, qx1:qx2]
    if crop.sum() == 0:
        return None
    ow, oh = orig_wh
    yy = (np.arange(oh) * crop.shape[0] / oh).astype(int)
    xx = (np.arange(ow) * crop.shape[1] / ow).astype(int)
    return crop[yy][:, xx].astype(np.uint8)


class OracleBackend:
    """GT-as-prediction stand-in: exercises the full harness without SAM3."""

    def __init__(self, coco_val, img_dir):
        self.coco = coco_val

    def predict(self, canvas, boxes, query_xyxy, q_img_id, cat_id):
        anns = self.coco.loadAnns(self.coco.getAnnIds(
            imgIds=[q_img_id], catIds=[cat_id]))
        return [(self.coco.annToMask(a).astype(np.uint8), 1.0)
                for a in anns], True  # masks already in original coords


class Sam3Backend:
    """The notebook's model side (external torch model, gated at import)."""

    def __init__(self, device=None):
        import torch
        from transformers import Sam3Model, Sam3Processor
        self.torch = torch
        self.device = device or ("cuda" if torch.cuda.is_available()
                                 else "cpu")
        self.model = Sam3Model.from_pretrained("facebook/sam3").to(self.device)
        self.proc = Sam3Processor.from_pretrained("facebook/sam3")

    def predict(self, canvas, boxes, query_xyxy, q_img_id, cat_id):
        inputs = self.proc(images=canvas, input_boxes=[boxes],
                           input_boxes_labels=[[1] * len(boxes)],
                           return_tensors="pt").to(self.device)
        with self.torch.no_grad():
            out = self.model(**inputs)
        res = self.proc.post_process_instance_segmentation(
            out, threshold=0.4, mask_threshold=0.5,
            target_sizes=inputs.get("original_sizes").tolist())[0]
        masks = res["masks"].cpu().numpy()
        scores = res["scores"].cpu().numpy()
        return list(zip(masks, map(float, scores))), False


def run_eval(dataset_root, support_pkl, backend_name, out_path, target_h=512,
             max_queries=None):
    root = Path(dataset_root)
    coco_train = COCO(str(root / "annotations/instances_train2017.json"))
    coco_val = COCO(str(root / "annotations/instances_val2017.json"))
    with open(support_pkl, "rb") as f:
        support_data = pickle.load(f)
    cat_names = {c["id"]: c["name"]
                 for c in coco_val.loadCats(coco_val.getCatIds())}

    backend = (OracleBackend(coco_val, root / "val2017")
               if backend_name == "oracle" else Sam3Backend())

    results, eval_ids = [], set()
    for cat_id, name in cat_names.items():
        if cat_id not in support_data:
            continue
        support_items = []
        for item in support_data[cat_id]:
            info = coco_train.loadImgs([item["img_id"]])[0]
            f = root / "train2017" / info["file_name"]
            img = (Image.open(f).convert("RGB") if f.exists() else
                   Image.new("RGB", (info["width"], info["height"])))
            boxes = [[a["bbox"][0], a["bbox"][1],
                      a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                     for a in coco_train.loadAnns(item["ann_ids"])]
            support_items.append((img, boxes))

        q_ids = coco_val.getImgIds(catIds=[cat_id])[:max_queries]
        print(f"{name}: {len(q_ids)} query images, "
              f"{len(support_items)} supports")
        for qid in q_ids:
            eval_ids.add(qid)
            info = coco_val.loadImgs([qid])[0]
            f = root / "val2017" / info["file_name"]
            q_img = (Image.open(f).convert("RGB") if f.exists() else
                     Image.new("RGB", (info["width"], info["height"])))
            canvas, boxes, q_xyxy = concat_images_and_boxes(
                support_items, q_img, target_h)
            if not boxes:
                continue
            preds, in_orig = backend.predict(canvas, boxes, q_xyxy, qid,
                                             cat_id)
            for mask, score in preds:
                m = mask if in_orig else crop_back(mask, q_xyxy, q_img.size)
                if m is None or m.sum() == 0:
                    continue
                results.append({"image_id": qid, "category_id": cat_id,
                                "segmentation": rle_mod.encode_mask(m > 0),
                                "score": score})

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f)
    print(f"{len(results)} predictions -> {out_path}")

    if results:
        print("\n--- COCO segm mAP ---")
        dt = coco_val.loadRes(results)
        ev = COCOeval(coco_val, dt, "segm")
        ev.params.imgIds = sorted(eval_ids)
        ev.evaluate(); ev.accumulate(); ev.summarize()
        print("\n--- instance -> semantic mIoU ---")
        from no_time_to_train_tpu.data.converters import (
            coco_inst_to_segm_eval)
        coco_inst_to_segm_eval(
            str(root / "annotations/instances_val2017.json"), out_path,
            img_ids=sorted(eval_ids))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-root", default="data/olive_diseases")
    p.add_argument("--support-pkl", required=True)
    p.add_argument("--backend", choices=("sam3", "oracle"), default="sam3")
    p.add_argument("--target-h", type=int, default=512)
    p.add_argument("--max-queries", type=int, default=None)
    p.add_argument("--out", default="work_dirs/sam3_fsl/results.json")
    a = p.parse_args()
    run_eval(a.dataset_root, a.support_pkl, a.backend, a.out, a.target_h,
             a.max_queries)


if __name__ == "__main__":
    main()
