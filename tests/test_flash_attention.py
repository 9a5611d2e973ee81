"""Pallas flash attention vs XLA SDPA (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.ops.attention import _xla_sdpa
from no_time_to_train_tpu.ops import flash_attention as fa


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_flash_kernel_interpret(rng):
    import functools
    from jax.experimental import pallas as pl
    bh, n, d = 2, 512, 128
    q = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.float32)
    block_q = block_k = 256
    sm_scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(fa._flash_kernel, block_k=block_k,
                               sm_scale=sm_scale)
    out = pl.pallas_call(
        kernel,
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=True,
    )(q, k, v)
    ref = _xla_sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_flash_sdpa_fallback_small(rng):
    # tiny shapes fall back to XLA path and must be exact
    q = jnp.asarray(rng.standard_normal((1, 2, 8, 32)), jnp.float32)
    out = fa.flash_sdpa(q, q, q)
    ref = _xla_sdpa(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_flash_padded_head_dim_interpret(rng, monkeypatch):
    # d=72 (Hiera) exercises the lane-padding path; run kernel interpreted
    import functools
    from jax.experimental import pallas as pl
    monkeypatch.setattr(fa, "_flash_bh", functools.partial(
        _interp_flash_bh))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = jnp.asarray(rng.standard_normal((1, 2, 512, 72)), jnp.float32)
    out = fa.flash_sdpa(q, q, q, block_q=256, block_k=256)
    ref = _xla_sdpa(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


def _interp_flash_bh(q, k, v, block_q, block_k):
    import functools
    from jax.experimental import pallas as pl
    bh, n, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(fa._flash_kernel, block_k=block_k,
                               sm_scale=sm_scale)
    return pl.pallas_call(
        kernel, grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=True,
    )(q, k, v)
