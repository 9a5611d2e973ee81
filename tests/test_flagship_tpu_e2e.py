"""Full-flagship e2e composition check on the real TPU (VERDICT r4 #6).

Per-kernel parity tests (decoder_attention / flash / upscale) validate each
Pallas kernel in isolation; e2e accuracy tests run on CPU where the kernel
paths are gated off. This test closes the gap: it runs the COMPLETE flagship
test step (SAM2-L + DINOv2-L, bf16, shipping defaults: attention_impl=pallas,
dense decoder, Pallas decode/upscale kernels) on the chip and checks

  1. cross-impl consistency: the same step with attention_impl="xla" (same
     params, same image) must agree within bf16 accumulation noise — a
     composition drift at a kernel boundary shows up here immediately;
  2. a committed golden-stats snapshot (tests/golden/flagship_tpu_stats.json)
     with tolerance bands — regression across rounds/toolchain bumps. On
     first TPU run the snapshot is created (commit it).

Auto-skips without a TPU (selected by `-k tpu` with the rest of the real-TPU
parity set). Reference methodology: the golden-AP acceptance numbers
(/root/reference/README.md:250-258) scaled to what this image can run
(no datasets/checkpoints -> deterministic random weights + synthetic image).
"""
import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "flagship_tpu_stats.json")


def _stats(out):
    valid = np.asarray(out["valid"])
    n = int(valid.sum())
    scores = np.asarray(out["scores"], np.float64)
    lr = np.asarray(out["lr_logits"][:n], np.float32)
    areas = (lr > 0).reshape(n, -1).mean(axis=1) if n else np.zeros(0)
    return dict(
        n_valid=n,
        scores=scores[:20].tolist(),
        labels=np.asarray(out["labels"])[:20].tolist(),
        pred_ious=np.asarray(out["pred_ious"], np.float64)[:20].tolist(),
        area_frac=areas[:20].tolist(),
    )


def test_flagship_e2e_tpu_golden_stats():
    import jax
    dev = next((d for d in jax.devices() if d.platform != "cpu"), None)
    if dev is None:
        pytest.skip("no TPU device available")
    from no_time_to_train_tpu.models.matching.pipeline import (
        NoAMGMatcher, MatchingConfig)
    from no_time_to_train_tpu.models.matching import memory_bank as mb

    m = NoAMGMatcher("sam2_hiera_l.yaml", "dinov2_large",
                     MatchingConfig(compute_dtype="bfloat16"),
                     n_classes=20, memory_length=10)
    # a zero (unfilled) bank yields all-zero similarities and the positive
    # filter drops every mask — fill a few synthetic references first
    rng = np.random.default_rng(7)
    refs = rng.random((4, 512, 512, 3)).astype(np.float32)
    ref_masks = np.zeros((4, 512, 512), np.float32)
    for i in range(4):
        ref_masks[i, 90 + 40 * i:300 + 20 * i, 140:400] = 1.0
        refs[i, 90 + 40 * i:300 + 20 * i, 140:400] += 0.3
    m.fill_memory(refs, ref_masks, [0, 1, 2, 3])
    m.bank = mb.postprocess(m.bank)
    img = np.random.default_rng(0).random((1024, 1024, 3)) \
        .astype(np.float32) * 0.5
    for j in range(5):  # bright blocks: structured, non-degenerate masks
        y0, x0 = 120 + 150 * j, (90 + 170 * j) % 700
        img[y0:y0 + 180, x0:x0 + 200] = 0.6 + 0.08 * j
    out = m.fetch_test(m.test_async(img))
    st = _stats(out)
    assert st["n_valid"] > 0, "flagship step produced no valid masks"

    # 1) cross-impl: same params through the xla attention path
    m2 = NoAMGMatcher("sam2_hiera_l.yaml", "dinov2_large",
                      MatchingConfig(compute_dtype="bfloat16",
                                     attention_impl="xla"),
                      n_classes=20, memory_length=10,
                      sam2_params=m.sam2_params, dino_params=m.dino_params)
    m2.bank = m.bank
    out2 = m2.fetch_test(m2.test_async(img))
    st2 = _stats(out2)
    # the two paths round bf16 differently inside attention; the ranked
    # output lists must still agree to small tolerances
    assert abs(st["n_valid"] - st2["n_valid"]) <= 2, (st["n_valid"],
                                                      st2["n_valid"])
    k = min(10, st["n_valid"], st2["n_valid"])
    np.testing.assert_allclose(st["scores"][:k], st2["scores"][:k],
                               atol=2e-2, rtol=5e-2)
    assert st["labels"][:k] == st2["labels"][:k]
    np.testing.assert_allclose(st["pred_ious"][:k], st2["pred_ious"][:k],
                               atol=3e-2, rtol=5e-2)
    np.testing.assert_allclose(st["area_frac"][:k], st2["area_frac"][:k],
                               atol=5e-3, rtol=5e-2)

    # 2) committed golden snapshot (created on first TPU run)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(st, f, indent=1)
        pytest.skip("golden snapshot created; commit it")
    with open(GOLDEN) as f:
        ref = json.load(f)
    assert abs(st["n_valid"] - ref["n_valid"]) <= 2
    k = min(10, st["n_valid"], ref["n_valid"])
    np.testing.assert_allclose(st["scores"][:k], ref["scores"][:k],
                               atol=2e-2, rtol=5e-2)
    assert st["labels"][:k] == ref["labels"][:k]
    np.testing.assert_allclose(st["pred_ious"][:k], ref["pred_ious"][:k],
                               atol=3e-2, rtol=5e-2)
    np.testing.assert_allclose(st["area_frac"][:k], ref["area_frac"][:k],
                               atol=5e-3, rtol=5e-2)
