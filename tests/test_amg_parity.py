"""AMG parity vs the reference SAM2AutomaticMaskGenerator (same tiny SAM2,
same grid, no crops): both must produce the same kept masks (up to ordering)."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from ref_loader import (install_reference_shim, install_torchvision_shim,  # noqa: E402
                        reference_available, build_ref_sam2)

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)
install_reference_shim()
install_torchvision_shim()

from no_time_to_train_tpu.config.presets import SAM2_PRESETS  # noqa: E402
from no_time_to_train_tpu.models.sam2.model import SAM2  # noqa: E402
from no_time_to_train_tpu.models.sam2.amg import SAM2AutomaticMaskGenerator  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import (convert_sam2,  # noqa: E402
                                                      torch_sd_to_numpy)

IMG = 256


def test_amg_matches_reference(rng):
    from sam2.automatic_mask_generator import (
        SAM2AutomaticMaskGenerator as TAMG)
    t_sam = build_ref_sam2("sam2_hiera_t.yaml", image_size=IMG, seed=3)
    t_amg = TAMG(t_sam, points_per_side=8, points_per_batch=64,
                 pred_iou_thresh=0.5, stability_score_thresh=0.6,
                 box_nms_thresh=0.7, crop_n_layers=0,
                 output_mode="binary_mask", multimask_output=True)

    # the reference predictor hardcodes 1024-res feature sizes (:106-ish);
    # fix them for the shrunken test resolution
    t_amg.predictor._bb_feat_sizes = [(IMG // 4, IMG // 4),
                                      (IMG // 8, IMG // 8),
                                      (IMG // 16, IMG // 16)]
    image = (rng.random((IMG, IMG, 3)) * 255).astype(np.uint8)
    with torch.no_grad():
        ref_recs = t_amg.generate(image)

    cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"],
                              image_size=IMG)
    model = SAM2(cfg)
    params = convert_sam2(torch_sd_to_numpy(t_sam), cfg)
    amg = SAM2AutomaticMaskGenerator(
        model, params, points_per_side=8, points_per_batch=64,
        pred_iou_thresh=0.5, stability_score_thresh=0.6, box_nms_thresh=0.7,
        crop_n_layers=0, multimask_output=True)
    got_recs = amg.generate(image.astype(np.float32) / 255.0)

    assert abs(len(got_recs) - len(ref_recs)) <= max(1, len(ref_recs) // 5), \
        (len(got_recs), len(ref_recs))
    # match each reference mask to our best-IoU mask
    matched = 0
    for r in ref_recs:
        rm = r["segmentation"]
        best = 0.0
        for g in got_recs:
            gm = g["segmentation"]
            inter = (rm & gm).sum()
            union = (rm | gm).sum()
            if union:
                best = max(best, inter / union)
        if best > 0.95:
            matched += 1
    assert matched >= len(ref_recs) * 0.8, (matched, len(ref_recs))
