"""End-to-end oracle test: the full fill -> postprocess -> test pipeline vs a
line-by-line torch re-walk of the reference forward_test
(Sam2MatchingBaseline_noAMG.py:435-698), using the reference SAM2Base, an HF
Dinov2, the reference MemoryBank, scoring fns and NMS shim — all with shared
random weights at small scale."""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import (install_reference_shim, install_torchvision_shim,  # noqa: E402
                        reference_available, build_ref_sam2)

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)
install_reference_shim()
install_torchvision_shim()

from torchvision.ops.boxes import batched_nms  # noqa: E402  (shim)
from no_time_to_train.models.matching_baseline_utils import (  # noqa: E402
    MemoryBank as TMemoryBank, compute_sim_global_avg, compute_semantic_ios)
from sam2.utils.amg import batched_mask_to_box as t_mask_to_box  # noqa: E402

from no_time_to_train_tpu.config.presets import SAM2_PRESETS, EncoderConfig  # noqa: E402
from no_time_to_train_tpu.models.matching.pipeline import (  # noqa: E402
    NoAMGMatcher, MatchingConfig, finalize_results, grid_points, IMAGENET_MEAN,
    IMAGENET_STD)
from no_time_to_train_tpu.models.dino import convert_hf_dinov2  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import (  # noqa: E402
    convert_sam2, torch_sd_to_numpy)

SAM_IMG = 256
ENC_IMG = 56
ENC_DIM = 32
N_CLASSES = 3
SHOTS = 2
PPS = 8          # 64 grid points
ORI = (512, 512)


def _make_hf_dino():
    from transformers import Dinov2Config, Dinov2Model
    cfg = Dinov2Config(hidden_size=ENC_DIM, num_hidden_layers=2,
                       num_attention_heads=2, image_size=ENC_IMG,
                       patch_size=14, layerscale_value=1e-5)
    t = Dinov2Model(cfg)
    g = torch.Generator().manual_seed(33)
    with torch.no_grad():
        for p in t.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return t.eval()


def _norm_t(x):
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    return (x - mean) / std


@pytest.fixture(scope="module")
def setup():
    t_sam = build_ref_sam2("sam2_hiera_t.yaml", image_size=SAM_IMG, seed=7)
    t_dino = _make_hf_dino()
    sam_cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"],
                                  image_size=SAM_IMG)
    enc_cfg = EncoderConfig("tiny", ENC_IMG, 14, ENC_DIM, 2, 2, "local")
    mcfg = MatchingConfig(points_per_side=PPS, testing_point_bs=16,
                          iou_thr=0.5, nms_thr=0.5, num_out_instance=10,
                          cls_num_per_mask=1, analysis_res=ORI[0],
                          expand_ratio=2)
    matcher = NoAMGMatcher(
        sam_cfg, enc_cfg, mcfg, n_classes=N_CLASSES, memory_length=SHOTS,
        sam2_params=convert_sam2(torch_sd_to_numpy(t_sam), sam_cfg),
        dino_params=convert_hf_dinov2(torch_sd_to_numpy(t_dino), enc_cfg))
    return t_sam, t_dino, matcher, mcfg


def _dino_feats_t(t_dino, imgs):
    with torch.no_grad():
        out = t_dino(pixel_values=imgs).last_hidden_state
    return out[:, 1:, :]


@pytest.fixture(scope="module")
def filled(setup):
    """Both memory banks filled with identical reference crops + one
    postprocess each (reference forward_fill_memory :446-469 +
    postprocess_memory)."""
    t_sam, t_dino, matcher, mcfg = setup
    rng = np.random.default_rng(0)
    gh = ENC_IMG // 14
    t_bank = TMemoryBank({"category_num": N_CLASSES, "length": SHOTS,
                          "feat_shape": (gh * gh, ENC_DIM)}, 4, 3)
    for c in range(N_CLASSES):
        refs = rng.random((SHOTS, 3, 64, 64)).astype(np.float32)
        msks = np.zeros((SHOTS, 64, 64), np.float32)
        for s in range(SHOTS):
            y0, x0 = rng.integers(0, 32, 2)
            msks[s, y0:y0 + 24, x0:x0 + 24] = 1.0
        # oracle (reference forward_fill_memory :446-469)
        ri = TF.interpolate(torch.from_numpy(refs), size=(ENC_IMG, ENC_IMG),
                            mode="bicubic")
        feats = _dino_feats_t(t_dino, _norm_t(ri)).reshape(SHOTS, -1, ENC_DIM)
        mk = TF.interpolate(torch.from_numpy(msks).unsqueeze(0), size=(gh, gh),
                            mode="nearest").reshape(SHOTS, -1)
        for s in range(SHOTS):
            ind = t_bank.fill_counts[c]
            t_bank.feats[c, ind] += feats[s]
            t_bank.masks[c, ind] += mk[s]
            t_bank.fill_counts[c] += 1
        # ours
        matcher.fill_memory(refs.transpose(0, 2, 3, 1), msks,
                            np.full(SHOTS, c))

    with torch.no_grad():
        t_bank.postprocess()
    matcher.postprocess_memory()
    return t_sam, t_dino, matcher, mcfg, t_bank


def _oracle_forward_test(t_sam, t_dino, t_bank, mcfg, tar, ori):
    """Line-by-line torch re-walk of the reference forward_test
    (Sam2MatchingBaseline_noAMG.py:435-698) for one [3, H, W] image;
    returns dict(masks, scores, labels) at `ori` resolution."""
    gh = ENC_IMG // 14
    tar_t = torch.from_numpy(tar)
    with torch.no_grad():
        # _extract_target_features (:511-532)
        enc_in = TF.interpolate(tar_t.unsqueeze(0), size=(ENC_IMG, ENC_IMG),
                                mode="bicubic")
        tar_feat = _dino_feats_t(t_dino, _norm_t(enc_in)).reshape(-1, ENC_DIM)

        # _forward_sam (:355-433)
        img_in = _norm_t(tar_t.unsqueeze(0))
        backbone_out = t_sam.forward_image(img_in)
        _, vis_feats, _, feat_sizes = t_sam._prepare_backbone_features(
            backbone_out)
        img_feats = vis_feats[-1].permute(1, 2, 0).reshape(
            1, -1, *feat_sizes[-1])
        hr_feats = [x.permute(1, 2, 0).reshape(1, -1, *s)
                    for x, s in zip(vis_feats[:-1], feat_sizes[:-1])]
        pts = np.asarray(grid_points(PPS, SAM_IMG))
        points = torch.from_numpy(pts)
        bs = mcfg.testing_point_bs
        all_masks, all_scores = [], []
        for i in range(len(points) // bs):
            pi = points[i * bs:(i + 1) * bs]
            sparse, dense = t_sam.sam_prompt_encoder(
                points=(pi.reshape(bs, 1, 2),
                        torch.ones(bs, 1, dtype=torch.int32)),
                boxes=None, masks=None)
            mm, ii, _, _ = t_sam.sam_mask_decoder(
                image_embeddings=img_feats.expand(bs, -1, -1, -1),
                image_pe=t_sam.sam_prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense,
                multimask_output=True, repeat_image=False,
                high_res_features=[h.expand(bs, -1, -1, -1) for h in hr_feats],
                return_iou_token_out=False, disable_custom_iou_embed=True,
                disable_mlp_obj_scores=True, output_all_masks=True)
            best = torch.argmax(ii[:, 1:], dim=-1) + 1
            bi = torch.arange(bs)
            all_masks.append(mm[bi, best])
            all_scores.append(ii[bi, best].reshape(-1))
        lr_masks = torch.cat(all_masks)
        pred_ious = torch.cat(all_scores)
        keep = pred_ious > mcfg.iou_thr
        lr_masks, pred_ious = lr_masks[keep], pred_ious[keep]

        # _process_sam_masks (:534-560)
        n_m = lr_masks.shape[0]
        masks_bool = (lr_masks > 0).reshape(n_m, -1)
        feat_sp = tar_feat.reshape(1, gh, gh, -1).permute(0, 3, 1, 2)
        feat_sp = TF.interpolate(feat_sp, size=tuple(lr_masks.shape[-2:]),
                                 mode="bilinear", align_corners=False,
                                 antialias=True)
        feat_sp = feat_sp.reshape(ENC_DIM, -1).t()

        sim, obj_feats = compute_sim_global_avg(
            feat_sp, masks_bool, t_bank.feats_ins_avg, softmax=False,
            temp=1.0, ret_feats=True)
        top_scores, labels = torch.topk(sim, k=1)
        labels = labels.flatten()
        scores_all = top_scores.flatten()

        lr_boxes = t_mask_to_box(lr_masks > 0)
        out_num = int(min(mcfg.num_out_instance * mcfg.expand_ratio,
                          labels.shape[0]))
        nms_keep = batched_nms(lr_boxes.float(), pred_ious.flatten(), labels,
                               iou_threshold=mcfg.nms_thr)[:out_num]
        scores_out = scores_all[nms_keep]
        lr_out = lr_masks[nms_keep]
        obj_out = obj_feats[nms_keep]
        labels_out = labels[nms_keep]
        pos = scores_out > 0
        scores_out, lr_out = scores_out[pos], lr_out[pos]
        obj_out, labels_out = obj_out[pos], labels_out[pos]

        masks_bin = TF.interpolate(lr_out.unsqueeze(1), size=ori,
                                   mode="bilinear", align_corners=False,
                                   antialias=True).squeeze(1) > 0
        obj_sim = (obj_out @ obj_out.t()).clamp(min=0)
        ios = compute_semantic_ios(masks_bin, labels_out, obj_sim, N_CLASSES,
                                   use_semantic=True, rank_score=True)
        scores_out = scores_out * torch.pow(1 - ios, 0.5)
        fin = torch.argsort(scores_out, descending=True)[:mcfg.num_out_instance]
        return dict(masks=masks_bin[fin].numpy(),
                    scores=scores_out[fin].numpy(),
                    labels=labels_out[fin].numpy())


def _compare_one(got, ref, tag=""):
    assert len(got["scores"]) == len(ref["scores"]), \
        (tag, len(got["scores"]), len(ref["scores"]))
    np.testing.assert_allclose(got["scores"], ref["scores"], atol=2e-3,
                               rtol=1e-2)
    np.testing.assert_array_equal(got["labels"], ref["labels"])
    for i in range(len(ref["scores"])):
        a, b = got["binary_masks"][i], ref["masks"][i]
        inter = (a & b).sum()
        union = (a | b).sum()
        assert union == 0 or inter / union > 0.98, f"{tag} mask {i} IoU low"


def test_full_pipeline_parity(filled, rng):
    t_sam, t_dino, matcher, mcfg, t_bank = filled
    np.testing.assert_allclose(np.asarray(matcher.bank.feats_ins_avg),
                               t_bank.feats_ins_avg.numpy(), atol=1e-3,
                               rtol=1e-2)
    tar = rng.random((3, SAM_IMG, SAM_IMG)).astype(np.float32)
    ref = _oracle_forward_test(t_sam, t_dino, t_bank, mcfg, tar, ORI)
    got_raw = matcher.test(tar.transpose(1, 2, 0))
    got = finalize_results(got_raw, *ORI, exact_resize=True)
    _compare_one(got, ref)


def _mask_to_xywh(m):
    ys, xs = np.where(m)
    if len(ys) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    return [float(xs.min()), float(ys.min()),
            float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)]


def test_dataset_differential_ap(filled, tmp_path):
    """Dataset-level differential (VERDICT r2 #2): 8 images through BOTH
    pipelines with shared random weights; detections must match per image
    (labels, boxes within 1px, mask IoU > 0.99) and COCOeval AP over the
    whole set must agree to <= 1e-3. GT is built from the oracle's own
    top detections so the AP values are non-degenerate
    (reference run_lightning.py:184 + coco_ref_dataset.py:652-662)."""
    from no_time_to_train_tpu.data import rle as rle_mod
    from no_time_to_train_tpu.data.coco_api import COCO
    from no_time_to_train_tpu.data.cocoeval import COCOeval
    import json

    t_sam, t_dino, matcher, mcfg, t_bank = filled
    n_imgs = 8
    rng = np.random.default_rng(12)

    images, gt_anns, det_ref, det_got = [], [], [], []
    aid = 1
    for i in range(n_imgs):
        img_id = i + 1
        tar = rng.random((3, SAM_IMG, SAM_IMG)).astype(np.float32)
        ref = _oracle_forward_test(t_sam, t_dino, t_bank, mcfg, tar, ORI)
        got_raw = matcher.test(tar.transpose(1, 2, 0))
        got = finalize_results(got_raw, *ORI, exact_resize=True)

        _compare_one(got, ref, tag=f"img{img_id}")
        # boxes within 1px
        for k in range(len(ref["scores"])):
            bg = _mask_to_xywh(got["binary_masks"][k])
            br = _mask_to_xywh(ref["masks"][k])
            assert np.abs(np.array(bg) - np.array(br)).max() <= 1.0, \
                f"img{img_id} det{k} box off: {bg} vs {br}"

        images.append({"id": img_id, "height": ORI[0], "width": ORI[1],
                       "file_name": f"{img_id}.png"})
        # GT = oracle's top-3 detections for this image
        for k in range(min(3, len(ref["scores"]))):
            m = ref["masks"][k]
            gt_anns.append({"id": aid, "image_id": img_id,
                            "category_id": int(ref["labels"][k]) + 1,
                            "bbox": _mask_to_xywh(m),
                            "area": float(m.sum()), "iscrowd": 0,
                            "segmentation": rle_mod.encode_mask(m)})
            aid += 1
        for out, dets, mask_key in ((ref, det_ref, "masks"),
                                    (got, det_got, "binary_masks")):
            for k in range(len(out["scores"])):
                m = out[mask_key][k]
                dets.append({"image_id": img_id,
                             "category_id": int(out["labels"][k]) + 1,
                             "bbox": _mask_to_xywh(m),
                             "score": float(out["scores"][k]),
                             "segmentation": rle_mod.encode_mask(m)})

    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps({
        "images": images, "annotations": gt_anns,
        "categories": [{"id": c + 1, "name": f"c{c}"}
                       for c in range(N_CLASSES)]}))
    coco_gt = COCO(str(gt_path))

    aps = {}
    for tag, dets in (("ref", det_ref), ("got", det_got)):
        dp = tmp_path / f"{tag}.json"
        dp.write_text(json.dumps(dets))
        stats = {}
        for iou_type in ("bbox", "segm"):
            ev = COCOeval(coco_gt, coco_gt.loadRes(str(dp)), iou_type)
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
            stats[iou_type] = ev.stats[0]
        aps[tag] = stats
    for iou_type in ("bbox", "segm"):
        assert aps["ref"][iou_type] > 0.1, aps  # non-degenerate
        assert abs(aps["ref"][iou_type] - aps["got"][iou_type]) <= 1e-3, aps


def test_semantic_ios_aspect_invariance(rng):
    """The device pipeline computes IoS at a square analysis resolution while
    the reference uses the original (possibly non-square) size; intersection/
    self-area ratios are invariant to anisotropic scaling up to boundary
    quantization — verify the approximation is tight."""
    import torch.nn.functional as TF
    from no_time_to_train_tpu.models.matching import scoring
    from no_time_to_train_tpu.ops.resize import resize_hw

    n = 24
    lr = torch.from_numpy(
        rng.standard_normal((n, 64, 64)).astype(np.float32) * 2)
    labels = rng.integers(0, 3, n)
    obj_sim = np.clip(rng.random((n, n)).astype(np.float32), 0, 1)
    obj_sim = (obj_sim + obj_sim.T) / 2

    # reference: upsample to non-square ori, compute IoS there
    ref_bin = TF.interpolate(lr.unsqueeze(1), size=(384, 512),
                             mode="bilinear", align_corners=False,
                             antialias=True).squeeze(1) > 0
    ref_ios = compute_semantic_ios(ref_bin, torch.from_numpy(labels),
                                   torch.from_numpy(obj_sim), 3,
                                   use_semantic=True, rank_score=True).numpy()

    # ours: square analysis resolution
    got_bin = np.asarray(resize_hw(jnp.asarray(lr.numpy()), (512, 512),
                                   mode="bilinear")) > 0
    got_ios = np.asarray(scoring.semantic_ios(
        jnp.asarray(got_bin.reshape(n, -1)), jnp.asarray(labels),
        jnp.asarray(obj_sim)))
    np.testing.assert_allclose(got_ios, ref_ios, atol=0.02)
    # score decay factor differs by < 2% absolute
    ref_decay = np.sqrt(np.clip(1 - ref_ios, 0, None))
    got_decay = np.sqrt(np.clip(1 - got_ios, 0, None))
    assert np.abs(ref_decay - got_decay).max() < 0.02

    # NATIVE-res IoS (the deployed analysis_res=256 == lr mask size, no
    # upsample; round-3 perf change): same tolerance vs the reference's
    # original-size computation. Measured max decay delta 7e-4 on blobby
    # masks at 256 vs 4e-4 at 512.
    got_native = np.asarray(scoring.semantic_ios(
        jnp.asarray((lr.numpy() > 0).reshape(n, -1)), jnp.asarray(labels),
        jnp.asarray(obj_sim)))
    native_decay = np.sqrt(np.clip(1 - got_native, 0, None))
    assert np.abs(ref_decay - native_decay).max() < 0.02
