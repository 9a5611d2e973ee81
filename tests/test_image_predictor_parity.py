"""SAM2ImagePredictor parity vs the reference (point + box prompts)."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import (install_reference_shim, install_torchvision_shim,  # noqa: E402
                        reference_available, build_ref_sam2)

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)
install_reference_shim()
install_torchvision_shim()

from no_time_to_train_tpu.config.presets import SAM2_PRESETS  # noqa: E402
from no_time_to_train_tpu.models.sam2.model import SAM2  # noqa: E402
from no_time_to_train_tpu.models.sam2.image_predictor import SAM2ImagePredictor  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import (convert_sam2,  # noqa: E402
                                                      torch_sd_to_numpy)

IMG = 256


def test_image_predictor_parity(rng):
    from sam2.sam2_image_predictor import SAM2ImagePredictor as TPred
    t_sam = build_ref_sam2("sam2_hiera_t.yaml", image_size=IMG, seed=9)
    t_pred = TPred(t_sam)
    t_pred._bb_feat_sizes = [(IMG // 4, IMG // 4), (IMG // 8, IMG // 8),
                             (IMG // 16, IMG // 16)]

    image = (rng.random((200, 240, 3)) * 255).astype(np.uint8)
    with torch.no_grad():
        t_pred.set_image(image)
        ref_masks, ref_ious, ref_lr = t_pred.predict(
            point_coords=np.array([[120.0, 100.0]]),
            point_labels=np.array([1]), multimask_output=True)

    cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"],
                              image_size=IMG)
    model = SAM2(cfg)
    params = convert_sam2(torch_sd_to_numpy(t_sam), cfg)
    pred = SAM2ImagePredictor(model, params)
    pred.set_image(image.astype(np.float32) / 255.0)
    got_masks, got_ious, got_lr = pred.predict(
        point_coords=[[120.0, 100.0]], point_labels=[1],
        multimask_output=True)

    np.testing.assert_allclose(got_ious[0], ref_ious, atol=5e-3, rtol=1e-2)
    for i in range(3):
        a = got_masks[0, i]
        b = ref_masks[i].astype(bool)
        union = (a | b).sum()
        iou = 1.0 if union == 0 else (a & b).sum() / union
        assert iou > 0.97, f"mask {i}: IoU {iou:.3f}"
