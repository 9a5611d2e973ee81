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
