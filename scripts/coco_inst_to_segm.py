#!/usr/bin/env python
"""CLI for the instance->semantic segmentation evaluation (reference
no_time_to_train/dataset/coco_inst_to_segm.py:129-145): paints instance
predictions and GT into semantic label maps and reports per-class IoU +
mIoU. Driven per split/shot by launch_coco_semantic_eval.sh."""
import argparse

from no_time_to_train_tpu.data.converters import coco_inst_to_segm_eval


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Evaluate COCO instance to semantic segmentation")
    p.add_argument("--pred_json", type=str, required=True,
                   help="Path to prediction JSON file")
    p.add_argument("--class_split", type=str, required=True,
                   help="Class split name as defined in METAINFO")
    p.add_argument("--gt_json", type=str,
                   default="inst_to_segm/original/instances_val2017.json")
    p.add_argument("--confidence_threshold", type=float, default=0.5)
    p.add_argument("--replicate_reference_bug", action="store_true",
                   help="score the oracle's class indexing verbatim (0-based "
                        "full-list positions over range(N)) for "
                        "apples-to-apples comparison with published mIoU")
    a = p.parse_args(argv)

    print(f"\nEvaluating \033[31m{a.pred_json}\033[0m with class split "
          f"\033[31m{a.class_split}\033[0m")
    out = coco_inst_to_segm_eval(a.gt_json, a.pred_json,
                                 confidence_threshold=a.confidence_threshold,
                                 class_split=a.class_split,
                                 replicate_reference_bug=
                                 a.replicate_reference_bug)
    print(f"Mean IoU: {out['miou']:.4f}")
    return out


if __name__ == "__main__":
    main()
