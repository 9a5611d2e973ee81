"""Correctness of the experimental fused upscale+product Pallas kernel
(ops/upscale_product.py) against its pure-XLA reference, interpret mode."""
import numpy as np
import jax.numpy as jnp

from no_time_to_train_tpu.ops.upscale_product import (upscale_product,
                                                      upscale_product_xla)


def test_upscale_product_interpret():
    rng = np.random.default_rng(0)
    b, h, w, c1, c2 = 4, 8, 8, 16, 8
    u = jnp.asarray(rng.standard_normal((b, h * w * 4, c1), np.float32))
    k2 = jnp.asarray(rng.standard_normal((c1, 4 * c2), np.float32))
    bias = jnp.asarray(rng.standard_normal((4 * c2,), np.float32))
    s0 = jnp.asarray(rng.standard_normal((1, h * w * 4, 4 * c2), np.float32))
    hyp = jnp.asarray(rng.standard_normal((b, c2), np.float32))
    got = upscale_product(u, k2, bias, s0, hyp, h, w, interpret=True)
    ref = upscale_product_xla(u, k2, bias, s0, hyp, h, w)
    assert got.shape == (b, 4 * h, 4 * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _fused_inputs(rng, b, h, w, d, c1, c2):
    hw = h * w
    return dict(
        src_flat=jnp.asarray(rng.standard_normal((b, hw, d)), jnp.float32),
        k1mat=jnp.asarray(rng.standard_normal((d, 4 * c1)) * 0.1, jnp.float32),
        bias1=jnp.asarray(rng.standard_normal((4 * c1,)), jnp.float32),
        s1u=jnp.asarray(rng.standard_normal((hw, 4 * c1)), jnp.float32),
        ln_w=jnp.asarray(rng.standard_normal((c1,)) * 0.2 + 1, jnp.float32),
        ln_b=jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.float32),
        k2mat=jnp.asarray(rng.standard_normal((c1, 4 * c2)) * 0.2,
                          jnp.float32),
        bias2=jnp.asarray(rng.standard_normal((4 * c2,)), jnp.float32),
        s0u=jnp.asarray(rng.standard_normal((hw, 4, 4 * c2)), jnp.float32),
        hyper=jnp.asarray(rng.standard_normal((b, c2)), jnp.float32),
    )


def test_fused_upscale_mask_interpret():
    """The full-chain fused kernel (both deconvs + LN + skips + product)
    matches its XLA reference in interpret mode."""
    from no_time_to_train_tpu.ops.upscale_product import (
        fused_upscale_mask, fused_upscale_mask_xla)
    rng = np.random.default_rng(1)
    b, h, w, d, c1, c2 = 4, 8, 8, 32, 16, 8
    kw = _fused_inputs(rng, b, h, w, d, c1, c2)
    got = fused_upscale_mask(h=h, w=w, prompt_block=2, pos_block=16,
                             interpret=True, **kw)
    ref = fused_upscale_mask_xla(h=h, w=w, **kw)
    assert got.shape == (b, 4 * h, 4 * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_upscale_matches_decoder_path():
    """fused_upscale_mask_xla (the kernel's contraction) reproduces the
    decoder's production _upscale_product_unshuffled bit-path on the same
    random weights — i.e. the kernel computes the real model op, not just
    its own reference."""
    import jax
    from no_time_to_train_tpu.models.sam2.mask_decoder import MaskDecoder
    from no_time_to_train_tpu.ops.upscale_product import (
        fused_upscale_mask, fused_upscale_mask_xla)

    rng = np.random.default_rng(2)
    d, h, w, b = 64, 8, 8, 4
    c1, c2 = d // 4, d // 8
    dec = MaskDecoder(transformer_dim=d, use_high_res_features=True,
                      transformer_depth=1, transformer_mlp_dim=32,
                      transformer_num_heads=2)
    src_flat = jnp.asarray(rng.standard_normal((b, h * w, d)), jnp.float32)
    hyper = jnp.asarray(rng.standard_normal((b, c2)), jnp.float32)
    feat_s0 = jnp.asarray(rng.standard_normal((1, 4 * h, 4 * w, c2)),
                          jnp.float32)
    feat_s1 = jnp.asarray(rng.standard_normal((1, 2 * h, 2 * w, c1)),
                          jnp.float32)
    params = dec.init(jax.random.PRNGKey(0),
                      src_flat, hyper, h, w, (feat_s0, feat_s1),
                      method=dec._upscale_product_unshuffled)["params"]
    ref = dec.apply({"params": params}, src_flat, hyper, h, w,
                    (feat_s0, feat_s1),
                    method=dec._upscale_product_unshuffled)

    k1 = params["output_upscaling_0_weight"]
    k2 = params["output_upscaling_3_weight"]
    kw = dict(
        src_flat=src_flat,
        k1mat=k1.transpose(0, 2, 3, 1).reshape(d, 4 * c1),
        bias1=jnp.tile(params["output_upscaling_0_bias"], 4),
        s1u=feat_s1.reshape(h, 2, w, 2, c1).transpose(0, 2, 1, 3, 4)
        .reshape(h * w, 4 * c1),
        ln_w=params["output_upscaling_1"]["weight"],
        ln_b=params["output_upscaling_1"]["bias"],
        k2mat=k2.transpose(0, 2, 3, 1).reshape(c1, 4 * c2),
        bias2=jnp.tile(params["output_upscaling_3_bias"], 4),
        s0u=feat_s0.reshape(h, 2, 2, w, 2, 2, c2)
        .transpose(0, 3, 1, 4, 2, 5, 6).reshape(h * w, 4, 4 * c2),
        hyper=hyper,
    )
    got_xla = fused_upscale_mask_xla(h=h, w=w, **kw)
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    got = fused_upscale_mask(h=h, w=w, prompt_block=4, pos_block=32,
                             interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
