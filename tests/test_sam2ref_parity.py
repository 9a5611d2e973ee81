"""SAM2Ref parity vs the reference implementation: the custom-IoU decoder path
and the reference-memory fusion, with the reference's build_sam2_video_predictor
monkeypatched to a hydra-free build."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import (install_reference_shim, install_torchvision_shim,  # noqa: E402
                        install_hydra_shim, reference_available,
                        build_ref_sam2, _instantiate, REF)

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)
install_reference_shim()
install_torchvision_shim()
install_hydra_shim()

import yaml  # noqa: E402

from no_time_to_train_tpu.config.presets import SAM2_PRESETS  # noqa: E402
from no_time_to_train_tpu.models.sam2.model import SAM2  # noqa: E402
from no_time_to_train_tpu.models.sam2ref import SAM2Ref, Sam2RefConfig  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import (convert_sam2,  # noqa: E402
                                                      torch_sd_to_numpy, _lin,
                                                      _mlp)

IMG = 256


def _build_ref_sam2ref(seed=21):
    import no_time_to_train.models.SAM2Ref as ref_mod

    def fake_build(cfg_file, ckpt, device="cpu", **kw):
        with open(REF / "sam2_configs" / "sam2_hiera_t.yaml") as f:
            cfg = yaml.safe_load(f)["model"]
        cfg["_target_"] = "sam2.sam2_video_predictor.SAM2VideoPredictor"
        cfg["image_size"] = IMG
        cfg.setdefault("sam_mask_decoder_extra_args", {}).update(
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98)
        cfg["binarize_mask_from_pts_for_mem_enc"] = True
        model = _instantiate(cfg)
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in model.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
        return model.eval()

    orig = ref_mod.build_sam2_video_predictor
    ref_mod.build_sam2_video_predictor = fake_build
    try:
        hw = IMG // 16
        t_ref = ref_mod.SAM2Ref(
            "unused", None,
            memory_bank_cfg={"category_num": 2, "length": 1,
                             "feat_size": hw * hw, "dimension": 64},
            semantic_ref=True, enable_memory_bank=True,
            testing_cfg={"point_bs": 4, "nms_iou_thr": 0.7,
                         "max_keep_num": 8})
        g = torch.Generator().manual_seed(seed + 1)
        with torch.no_grad():
            for p in [t_ref.mem_feat_ref_pe.weight, t_ref.iou_embed.weight]:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
            for p in t_ref.iou_prediction_head.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
        return t_ref.eval()
    finally:
        ref_mod.build_sam2_video_predictor = orig


def test_sam2ref_fill_and_test_parity(rng):
    t_ref = _build_ref_sam2ref()

    cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"],
                              image_size=IMG)
    model = SAM2(cfg)
    params = convert_sam2(torch_sd_to_numpy(t_ref.predictor), cfg)
    ours = SAM2Ref(model, params,
                   Sam2RefConfig(n_categories=2, memory_length=1,
                                 testing_point_bs=4, testing_nms_iou_thr=0.7,
                                 testing_out_num=8))
    sd = torch_sd_to_numpy(t_ref)
    ours.head_params = {
        "mem_feat_ref_pe": sd["mem_feat_ref_pe.weight"][0],
        "iou_embed": sd["iou_embed.weight"],
        "iou_prediction_head": _mlp(sd, "iou_prediction_head", 3),
    }

    # ---- fill one reference per class, both sides
    refs, masks = [], []
    for c in range(2):
        img = rng.random((IMG, IMG, 3)).astype(np.float32)
        m = np.zeros((IMG, IMG), np.float32)
        m[60 + 40 * c: 160 + 20 * c, 80: 200] = 1.0
        refs.append(img)
        masks.append(m)
        # the reference's dataset normalizes (norm_img=True); our SAM2Ref
        # normalizes internally — feed the reference pre-normalized images
        from no_time_to_train_tpu.models.matching.pipeline import _normalize
        img_n = _normalize(img)
        input_dicts = [{
            "refs_by_cat": {c: {
                "imgs": torch.from_numpy(
                    img_n.transpose(2, 0, 1).copy())[None],
                "masks": torch.from_numpy(m)[None],
                "img_info": [{"id": c}]}},
        }]
        with torch.no_grad():
            t_ref.forward_fill_memory(input_dicts)
        ours.fill_memory(c, img[None], m[None])

    np.testing.assert_allclose(np.asarray(ours.memory_bank),
                               t_ref.memory_bank.numpy().reshape(
                                   *ours.memory_bank.shape),
                               atol=2e-3, rtol=1e-2)
    # reference stores PE with mem_feat_ref_pe already added (:617); ours
    # adds it at fusion time
    np.testing.assert_allclose(
        np.asarray(ours.memory_pe)
        + np.asarray(ours.head_params["mem_feat_ref_pe"]),
        t_ref.memory_pe.numpy(), atol=2e-3, rtol=1e-2)

    # ---- test phase
    tar = rng.random((IMG, IMG, 3)).astype(np.float32)
    from no_time_to_train_tpu.models.matching.pipeline import _normalize
    tar_n = _normalize(tar)
    from no_time_to_train_tpu.models.matching.pipeline import grid_points
    pts = np.asarray(grid_points(2, IMG))
    with torch.no_grad():
        ref_out = t_ref.forward_test([{
            "target_img": torch.from_numpy(tar_n.transpose(2, 0, 1).copy()),
            "query_points": torch.from_numpy(pts.copy()),
            "target_img_info": {"ori_height": IMG, "ori_width": IMG,
                                "file_name": "x", "id": 0},
        }])[0]
    got = ours.forward_test(tar, points_per_side=2)

    n_valid = int(got["valid"].sum())
    n_ref = len(ref_out["scores"])
    assert n_valid == n_ref, (n_valid, n_ref)
    ref_scores = np.sort(ref_out["scores"].cpu().numpy())[::-1]
    got_scores = np.sort(got["scores"][got["valid"]])[::-1]
    np.testing.assert_allclose(got_scores, ref_scores, atol=5e-3, rtol=2e-2)
