"""End-to-end SAM2 parity: forward_image + forward_sam_heads vs the reference
SAM2Base built from sam2_configs/sam2_hiera_t.yaml (image_size shrunk to 256
for CPU speed)."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from ref_loader import reference_available, build_ref_sam2  # noqa: E402

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)

from no_time_to_train_tpu.config.presets import SAM2_PRESETS  # noqa: E402
from no_time_to_train_tpu.models.sam2.model import SAM2  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import (  # noqa: E402
    convert_sam2, torch_sd_to_numpy)

IMG = 256


@pytest.fixture(scope="module")
def pair():
    t = build_ref_sam2("sam2_hiera_t.yaml", image_size=IMG)
    cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"], image_size=IMG)
    m = SAM2(cfg)
    params = convert_sam2(torch_sd_to_numpy(t), cfg)
    return t, m, params, cfg


def test_forward_image_and_heads(pair):
    t, m, params, cfg = pair
    g = torch.Generator().manual_seed(11)
    img = torch.randn(1, 3, IMG, IMG, generator=g)

    with torch.no_grad():
        ref_out = t.forward_image(img)
        _, vis_feats, vis_pos, feat_sizes = t._prepare_backbone_features(ref_out)

    got_out = m.apply({"params": params},
                      jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
                      method=m.forward_image)
    for lvl, (r, rp) in enumerate(zip(ref_out["backbone_fpn"],
                                      ref_out["vision_pos_enc"])):
        g_ = np.asarray(got_out["backbone_fpn"][lvl]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g_, r.numpy(), atol=2e-3, rtol=1e-2,
                                   err_msg=f"fpn level {lvl}")
        gp = np.asarray(got_out["vision_pos_enc"][lvl]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(gp, rp.numpy(), atol=1e-5, rtol=1e-5)

    # --- SAM heads on the reference's own backbone features (isolates head
    # parity from encoder accumulation noise)
    B = 4
    pix = vis_feats[-1].permute(1, 2, 0).reshape(1, -1, *feat_sizes[-1])
    pix = pix.expand(B, -1, -1, -1)
    hi = [x.permute(1, 2, 0).reshape(1, -1, *s).expand(B, -1, -1, -1)
          for x, s in zip(vis_feats[:-1], feat_sizes[:-1])]
    coords = torch.rand(B, 1, 2, generator=g) * IMG
    labels = torch.ones(B, 1, dtype=torch.int32)

    with torch.no_grad():
        ref_heads = t._forward_sam_heads(
            backbone_features=pix,
            point_inputs={"point_coords": coords, "point_labels": labels},
            high_res_features=hi, multimask_output=True)
    (_, _, ref_ious, ref_lr, ref_hr, ref_obj_ptr, ref_obj_logits) = ref_heads

    def nhwc(x):
        return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))

    got = m.apply({"params": params}, nhwc(pix),
                  jnp.asarray(coords.numpy()), jnp.asarray(labels.numpy()),
                  None, [nhwc(h) for h in hi], True,
                  method=m.forward_sam_heads)
    got_lr, got_hr, got_ious, got_obj_ptr, got_obj_logits = got
    np.testing.assert_allclose(np.asarray(got_ious), ref_ious.numpy(),
                               atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_lr), ref_lr.numpy(),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_hr), ref_hr.numpy(),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_obj_ptr), ref_obj_ptr.numpy(),
                               atol=1e-3, rtol=1e-2)


def test_encode_memory(pair):
    t, m, params, cfg = pair
    g = torch.Generator().manual_seed(12)
    hw = IMG // 16
    feats = torch.randn(hw * hw, 1, cfg.d_model, generator=g)  # (HW)BC
    masks_hr = torch.randn(1, 1, IMG, IMG, generator=g) * 4

    with torch.no_grad():
        ref_feat, ref_pos = t._encode_new_memory(
            current_vision_feats=[feats], feat_sizes=[(hw, hw)],
            pred_masks_high_res=masks_hr, is_mask_from_pts=True)

    pix = feats.permute(1, 0, 2).reshape(1, hw, hw, cfg.d_model)
    got_feat, got_pos = m.apply(
        {"params": params}, jnp.asarray(pix.numpy()),
        jnp.asarray(masks_hr.numpy().transpose(0, 2, 3, 1)), True,
        method=m.encode_memory)
    np.testing.assert_allclose(np.asarray(got_feat).transpose(0, 3, 1, 2),
                               ref_feat.numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_pos).transpose(0, 3, 1, 2),
                               ref_pos[-1].numpy(), atol=1e-5, rtol=1e-5)
