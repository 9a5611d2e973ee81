"""Flagship-structure trace smoke (VERDICT r3 #6).

jit-lower (trace + StableHLO emit — no compile, no execute) the true
SAM2-L @ 1024 + DINOv2-L test step on the CPU backend, so trace-level
regressions of the flagship program are caught even when the TPU relay is
down (the driver's `entry()` downgrades to Hiera-T @ 512 off-TPU and would
miss them). Abstract ShapeDtypeStruct args keep the 0.5B-param trees out of
the jaxpr as constants.

The Pallas decode kernels are CPU-gated (`default_device_is_cpu`), so this
lowers their XLA formulations; kernel-level coverage lives in the
interpret-mode and real-TPU parity tests (test_upscale_product.py etc.).
Reference scope: the whole test path of
no_time_to_train/models/Sam2MatchingBaseline_noAMG.py at its published
SAM2-L + DINOv2-L configuration.
"""
import jax
import jax.numpy as jnp


def test_flagship_lowering_smoke():
    from no_time_to_train_tpu.models.matching.pipeline import (
        NoAMGMatcher, MatchingConfig)

    m = NoAMGMatcher("sam2_hiera_l.yaml", "dinov2_large",
                     MatchingConfig(compute_dtype="bfloat16"),
                     n_classes=20, memory_length=10)
    sp, dp, bank = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (m.sam2_params, m.dino_params, m.bank))
    img = jax.ShapeDtypeStruct((1024, 1024, 3), jnp.float32)

    def fn(sam2_params, dino_params, bank, img):
        return m._test_impl(sam2_params, dino_params, bank, bank, img,
                            with_negative=False)

    lowered = jax.jit(fn).lower(sp, dp, bank, img)
    # StableHLO emission (not just the jaxpr) proves every op lowers
    head = lowered.as_text()[:2000]
    assert "module" in head

    out = jax.tree.map(lambda i: jax.ShapeDtypeStruct(i.shape, i.dtype),
                       lowered.out_info)
    k = m.matching.num_out_instance
    assert out["scores"].shape == (k,)
    assert out["labels"].shape == (k,)
    assert out["valid"].shape == (k,)
    assert out["lr_logits"].shape[0] == k
    # low-res masks leave the device at the native decoder resolution
    assert out["lr_logits"].shape[-1] == 256
