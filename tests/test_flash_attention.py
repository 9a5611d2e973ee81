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
                               sm_scale=sm_scale, n_valid=n)
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
    monkeypatch.setattr(fa, "ONEPASS_MAX_NK", 0)  # pin the online kernel
    q = jnp.asarray(rng.standard_normal((1, 2, 512, 72)), jnp.float32)
    out = fa.flash_sdpa(q, q, q, block_q=256, block_k=256)
    ref = _xla_sdpa(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


def _interp_flash_bh(q, k, v, block_q, block_k, n_valid=None):
    import functools
    from jax.experimental import pallas as pl
    bh, n, d = q.shape
    n_k = k.shape[1]
    sm_scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(fa._flash_kernel, block_k=block_k,
                               sm_scale=sm_scale,
                               n_valid=n_k if n_valid is None else n_valid)
    return pl.pallas_call(
        kernel, grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_k, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=True,
    )(q, k, v)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_flash_ragged_seq_interpret(rng, monkeypatch):
    """DINO-shaped ragged sequence (N=1370, d=64): queries pad to the q-block
    grain and padded key columns are masked out of the softmax in-kernel."""
    monkeypatch.setattr(fa, "_flash_bh", _interp_flash_bh)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fa, "ONEPASS_MAX_NK", 0)  # pin the online kernel
    q = jnp.asarray(rng.standard_normal((1, 2, 1370, 64)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 1370, 64)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 1370, 64)), jnp.float32)
    out = fa.flash_sdpa(q, k, v)
    ref = _xla_sdpa(q, k, v)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_flash_ragged_kv_only_interpret(rng, monkeypatch):
    """Cross-attention shape: divisible queries against ragged keys."""
    monkeypatch.setattr(fa, "_flash_bh", _interp_flash_bh)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fa, "ONEPASS_MAX_NK", 0)  # pin the online kernel
    q = jnp.asarray(rng.standard_normal((1, 2, 512, 64)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 700, 64)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 700, 64)), jnp.float32)
    out = fa.flash_sdpa(q, k, v)
    ref = _xla_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


def test_default_impl_routing(monkeypatch, rng):
    """set_default_impl('pallas') routes long unmasked sequences through the
    flash kernel and short/masked ones through XLA (VERDICT r1 #3 wiring)."""
    from no_time_to_train_tpu.ops import attention as att

    calls = []

    def fake_flash(q, k, v, mask=None):
        calls.append(q.shape)
        return att._xla_sdpa(q, k, v, mask)

    monkeypatch.setattr(fa, "flash_sdpa", fake_flash)
    monkeypatch.setattr(att, "_default_device_is_cpu", lambda: False)
    prev = att.get_default_impl()
    att.set_default_impl("pallas")
    try:
        q_long = jnp.asarray(rng.standard_normal((1, 2, 1024, 32)),
                             jnp.float32)
        q_short = jnp.asarray(rng.standard_normal((4, 2, 8, 32)), jnp.float32)
        att.sdpa(q_long, q_long, q_long)          # routes to pallas
        att.sdpa(q_short, q_short, q_short)       # stays XLA (tiny N)
        att.sdpa(q_long, q_long, q_long,
                 mask=jnp.ones((1, 1, 1024, 1024), bool))  # masked -> XLA
        att.sdpa(q_long, q_long, q_long, impl="xla")        # explicit XLA
        assert calls == [(1, 2, 1024, 32)]
        att.set_default_impl("xla")
        att.sdpa(q_long, q_long, q_long)          # xla default: no flash
        assert calls == [(1, 2, 1024, 32)]
    finally:
        att.set_default_impl(prev)


def test_matching_config_sets_attention_impl():
    from no_time_to_train_tpu.ops import attention as att
    from no_time_to_train_tpu.models.matching.pipeline import MatchingConfig
    # "pallas" default since round 4 (measured faster on the flagship step);
    # every path falls back to fused XLA off-TPU / below the tiling minimum
    assert MatchingConfig().attention_impl == "pallas"
    assert att.get_default_impl() == "pallas"


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_onepass_kernel_interpret(rng, monkeypatch):
    """Single-pass kernel (whole key range in VMEM, native head dim) vs XLA:
    d=72 (Hiera global blocks) and an uneven query block split."""
    import functools
    monkeypatch.setattr(fa, "_onepass_bh",
                        functools.partial(fa._onepass_bh, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = jnp.asarray(rng.standard_normal((1, 2, 600, 72)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 512, 72)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 512, 72)), jnp.float32)
    out = fa.flash_sdpa(q, k, v)
    ref = _xla_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_onepass_ragged_interpret(rng, monkeypatch):
    """Single-pass kernel with ragged keys (DINO's 1370 tokens pad to 1408;
    padded key columns must be masked out of the softmax)."""
    import functools
    monkeypatch.setattr(fa, "_onepass_bh",
                        functools.partial(fa._onepass_bh, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = jnp.asarray(rng.standard_normal((1, 2, 1370, 64)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 1370, 64)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 1370, 64)), jnp.float32)
    out = fa.flash_sdpa(q, k, v)
    ref = _xla_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_onepass_bnhd_interpret(rng, monkeypatch):
    """bnhd single-pass entry (head axis as a grid dimension, no relayout)
    vs XLA at the DINO shape (ragged N=1370, h=4, d=64)."""
    import functools
    monkeypatch.setattr(fa, "_onepass_bnhd",
                        functools.partial(fa._onepass_bnhd, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = jnp.asarray(rng.standard_normal((1, 1370, 4, 64)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1370, 4, 64)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1370, 4, 64)), jnp.float32)
    out = fa.flash_sdpa_bnhd(q, k, v)
    assert out is not None and out.shape == q.shape
    ref = _xla_sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


def test_sdpa_bnhd_routes_flash_bnhd(monkeypatch, rng):
    """Under impl='pallas', sdpa_bnhd takes the native bnhd kernel (no
    swapaxes) for qualifying shapes and falls back for the rest."""
    from no_time_to_train_tpu.ops import attention as att
    calls = []

    def fake_bnhd(q, k, v):
        calls.append(q.shape)
        return q
    monkeypatch.setattr(fa, "flash_sdpa_bnhd", fake_bnhd)
    monkeypatch.setattr(att, "_default_device_is_cpu", lambda: False)
    q_long = jnp.zeros((1, 1024, 2, 32), jnp.float32)
    q_short = jnp.zeros((4, 8, 2, 32), jnp.float32)
    att.sdpa_bnhd(q_long, q_long, q_long, impl="pallas")
    att.sdpa_bnhd(q_short, q_short, q_short, impl="pallas")  # tiny N -> XLA
    att.sdpa_bnhd(q_long, q_long, q_long, impl="xla")
    assert calls == [(1, 1024, 2, 32)]


def test_flash_sdpa_routes_onepass_vs_online():
    """Key ranges <= ONEPASS_MAX_NK take the single-pass kernel; wider ones
    the online-softmax kernel (routing checked via monkeypatch sentinels)."""
    assert fa._onepass_block_q(1370, 1408) == 464   # DINO: 3 even blocks
    assert fa._onepass_block_q(4096, 4096) == 256   # Hiera global blocks
    assert fa._onepass_block_q(512, 512) == 512     # single block
    assert fa._onepass_block_q(600, 512) == 304     # uneven split, 8-grain


def test_flash_sdpa_routes_wide_keys_to_xla(monkeypatch, rng):
    """Key ranges wider than RESIDENT_MAX_NK (where the VMEM-resident k/v
    layout of the online kernel exceeds Mosaic's allocation) must take the
    fused XLA path rather than attempt a kernel that cannot compile."""
    def boom(*a, **k):
        raise AssertionError("kernel path must not be taken")
    monkeypatch.setattr(fa, "_flash_bh", boom)
    monkeypatch.setattr(fa, "_onepass_bh", boom)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    n_k = fa.RESIDENT_MAX_NK + 128
    q = jnp.asarray(rng.standard_normal((1, 1, 128, 64)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, n_k, 64)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, n_k, 64)) * 0.3, jnp.float32)
    out = fa.flash_sdpa(q, k, v, block_q=128, block_k=128)
    ref = _xla_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_onepass_hiera_global_tpu_parity(rng):
    """Compiled single-pass kernel at the Hiera global-block shape
    (n=4096, d=72 — a non-128 lane dim, the riskiest Mosaic lowering)
    vs XLA on the real TPU."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    dev = tpus[0]
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 2, 4096, 72)) * 0.3, jnp.bfloat16), dev)
    k = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 2, 4096, 72)) * 0.3, jnp.bfloat16), dev)
    v = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 2, 4096, 72)) * 0.3, jnp.bfloat16), dev)
    out = np.asarray(jax.jit(fa.flash_sdpa)(q, k, v), np.float32)
    ref = np.asarray(jax.jit(_xla_sdpa)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_onepass_bnhd_tpu_parity(rng):
    """Compiled bnhd single-pass kernel at the DINO-L shape
    ([1, 1370, 16, 64], ragged keys, head axis as grid dim) vs XLA on the
    real TPU."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    dev = tpus[0]
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 1370, 16, 64)) * 0.3, jnp.bfloat16), dev)
    k = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 1370, 16, 64)) * 0.3, jnp.bfloat16), dev)
    v = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 1370, 16, 64)) * 0.3, jnp.bfloat16), dev)
    out = np.asarray(jax.jit(fa.flash_sdpa_bnhd)(q, k, v), np.float32)

    def ref_fn(q, k, v):
        return _xla_sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    ref = np.asarray(jax.jit(ref_fn)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_onepass_bnhd_hiera_interpret(rng, monkeypatch):
    """bnhd single-pass entry at the Hiera global-block shape
    ([1, 4096, 8, 72]) — per-head lane slices land at NON-128-aligned
    offsets (72, 144, ...), the riskiest in-kernel slicing the shipped
    pallas default exercises."""
    import functools
    monkeypatch.setattr(fa, "_onepass_bnhd",
                        functools.partial(fa._onepass_bnhd, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = jnp.asarray(rng.standard_normal((1, 4096, 8, 72)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 4096, 8, 72)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 4096, 8, 72)), jnp.float32)
    out = fa.flash_sdpa_bnhd(q, k, v)
    assert out is not None and out.shape == q.shape
    ref = _xla_sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


def test_onepass_bnhd_hiera_tpu_parity(rng):
    """Compiled bnhd single-pass kernel at the EXACT flagship Hiera
    global-block shape ([1, 4096, 8, 72] bf16, per-head lane slices at
    unaligned offsets) vs XLA on the real TPU — this is the configuration
    the attention_impl='pallas' default ships, so a Mosaic mis-lowering
    here would corrupt every flagship mask."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    dev = tpus[0]
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 4096, 8, 72)) * 0.3, jnp.bfloat16), dev)
    k = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 4096, 8, 72)) * 0.3, jnp.bfloat16), dev)
    v = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 4096, 8, 72)) * 0.3, jnp.bfloat16), dev)
    out = np.asarray(jax.jit(fa.flash_sdpa_bnhd)(q, k, v), np.float32)

    def ref_fn(q, k, v):
        return _xla_sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    ref = np.asarray(jax.jit(ref_fn)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_online_kernel_tpu_parity(rng):
    """Compiled online-softmax kernel (key range beyond the one-pass cap)
    vs XLA on the real TPU."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    dev = tpus[0]
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 2, 5120, 64)) * 0.3, jnp.bfloat16), dev)
    k = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 2, 5120, 64)) * 0.3, jnp.bfloat16), dev)
    v = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 2, 5120, 64)) * 0.3, jnp.bfloat16), dev)
    out = np.asarray(jax.jit(fa.flash_sdpa)(q, k, v), np.float32)
    ref = np.asarray(jax.jit(_xla_sdpa)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_flash_sdpa_tpu_parity(rng):
    """Compiled (non-interpret) kernel vs XLA on the real TPU (the conftest
    pins the default device to CPU, so target the TPU explicitly).
    [.., 2048, 64] routes through the single-pass kernel."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    dev = tpus[0]
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 4, 2048, 64)) * 0.3, jnp.bfloat16), dev)
    k = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 4, 2048, 64)) * 0.3, jnp.bfloat16), dev)
    v = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 4, 2048, 64)) * 0.3, jnp.bfloat16), dev)
    # computation follows the committed device of the args
    out = np.asarray(jax.jit(fa.flash_sdpa)(q, k, v), np.float32)
    ref = np.asarray(jax.jit(_xla_sdpa)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_flash_sdpa_ragged_tpu_parity(rng):
    """Compiled ragged-sequence kernel (DINO's exact [16, 1370, 64] shape)
    vs XLA on the real TPU."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    dev = tpus[0]
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 16, 1370, 64)) * 0.3, jnp.bfloat16), dev)
    k = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 16, 1370, 64)) * 0.3, jnp.bfloat16), dev)
    v = jax.device_put(jnp.asarray(
        rng.standard_normal((1, 16, 1370, 64)) * 0.3, jnp.bfloat16), dev)
    out = np.asarray(jax.jit(fa.flash_sdpa)(q, k, v), np.float32)
    ref = np.asarray(jax.jit(_xla_sdpa)(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_sdpa_bnhd_matches_sdpa(rng):
    """sdpa_bnhd keeps [B, N, H, D] layout end-to-end; same math as sdpa on
    the transposed operands (Hiera's dh=72 head split, both branch shapes)."""
    from no_time_to_train_tpu.ops.attention import sdpa, sdpa_bnhd
    for b, n, h, d in [(3, 49, 2, 72), (1, 196, 4, 72), (2, 64, 1, 96)]:
        q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        out = sdpa_bnhd(q, k, v, impl="xla")
        ref = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                   v.transpose(0, 2, 1, 3), impl="xla").transpose(0, 2, 1, 3)
        assert out.shape == (b, n, h, d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_sdpa_bnhd_pallas_routing(rng, monkeypatch):
    """Under impl='pallas' the BNHD entry transposes into the flash path and
    back, preserving the attention_impl flag's meaning."""
    from no_time_to_train_tpu.ops import attention as att
    calls = {}
    real = att.sdpa

    def spy(q, k, v, mask=None, impl=None):
        calls["shape"] = q.shape
        return real(q, k, v, mask=mask, impl="xla")

    monkeypatch.setattr(att, "sdpa", spy)
    q = jnp.asarray(rng.standard_normal((1, 600, 2, 64)), jnp.float32)
    out = att.sdpa_bnhd(q, q, q, impl="pallas")
    assert calls["shape"] == (1, 2, 600, 64)  # transposed into sdpa's layout
    assert out.shape == (1, 600, 2, 64)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_flash_masked_interpret(rng):
    """Streaming masked kernel vs the XLA masked path (interpret mode):
    random per-batch key-column masks, including a fully-masked leading key
    BLOCK (the online carries must self-heal when the first valid key
    arrives) and a ragged valid prefix."""
    b, h, n_q, n_k, d = 2, 2, 64, 640, 64
    q = jnp.asarray(rng.standard_normal((b, h, n_q, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n_k, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n_k, d)) * 0.3, jnp.float32)
    valid = rng.random((b, n_k)) < 0.5
    valid[0, :128] = False          # whole first k-block masked
    valid[0, 128] = True            # first valid key mid-range
    valid[1, :] = np.arange(n_k) < 300   # ragged prefix
    valid = jnp.asarray(valid)
    out = fa.flash_sdpa_masked(q, k, v, valid, block_q=32, block_k=128,
                               interpret=True)
    ref = _xla_sdpa(q, k, v, mask=valid[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_flash_masked_uneven_shapes_interpret(rng):
    """Query/key counts off the block grain pad through (padded key columns
    carry the masked bias, padded query rows are sliced off)."""
    b, h, n_q, n_k, d = 1, 1, 50, 300, 32
    q = jnp.asarray(rng.standard_normal((b, h, n_q, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n_k, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n_k, d)) * 0.3, jnp.float32)
    valid = jnp.asarray(rng.random((b, n_k)) < 0.7)
    out = fa.flash_sdpa_masked(q, k, v, valid, block_q=16, block_k=128,
                               interpret=True)
    ref = _xla_sdpa(q, k, v, mask=valid[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


def test_sdpa_routes_masked_flash(monkeypatch, rng):
    """A key-column mask over a key range beyond the one-pass cap routes to
    the streaming masked kernel under impl='pallas'; other masked forms and
    short key ranges stay XLA."""
    from no_time_to_train_tpu.ops import attention as att
    calls = []

    def fake_masked(q, k, v, key_valid):
        calls.append((q.shape, k.shape))
        return att._xla_sdpa(q, k, v, key_valid[:, None, None, :])

    monkeypatch.setattr(fa, "flash_sdpa_masked", fake_masked)
    monkeypatch.setattr(fa, "ONEPASS_MAX_NK", 512)
    monkeypatch.setattr(att, "_default_device_is_cpu", lambda: False)
    q = jnp.asarray(rng.standard_normal((2, 1, 512, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 1, 768, 32)), jnp.float32)
    colmask = jnp.ones((2, 1, 1, 768), bool)
    att.sdpa(q, k, k, mask=colmask, impl="pallas")        # routes
    assert calls == [((2, 1, 512, 32), (2, 1, 768, 32))]
    att.sdpa(q, k, k, mask=jnp.ones((2, 1, 512, 768), bool),
             impl="pallas")                               # full mask -> XLA
    att.sdpa(q, q, q, mask=jnp.ones((2, 1, 1, 512), bool),
             impl="pallas")                               # short keys -> XLA
    att.sdpa(q, k, k, mask=colmask, impl="xla")           # explicit XLA
    assert len(calls) == 1


def test_flash_masked_tpu_parity(rng):
    """Compiled streaming masked kernel at the memory-attention shape
    (4096 queries x 28736 keys x d=256, h=1, ring-style validity: whole
    4096-token slots toggling + a partial pointer tail) vs XLA on the TPU."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    dev = tpus[0]
    b, n_q, n_k, d = 2, 4096, 7 * 4096 + 64, 256
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((b, 1, n_q, d)) * 0.2, jnp.bfloat16), dev)
    k = jax.device_put(jnp.asarray(
        rng.standard_normal((b, 1, n_k, d)) * 0.2, jnp.bfloat16), dev)
    v = jax.device_put(jnp.asarray(
        rng.standard_normal((b, 1, n_k, d)) * 0.2, jnp.bfloat16), dev)
    valid = np.zeros((b, n_k), bool)
    for o, slots in enumerate([(0, 2, 3), (0, 1, 2, 4, 6)]):
        for s in slots:
            valid[o, s * 4096:(s + 1) * 4096] = True
    valid[:, 7 * 4096: 7 * 4096 + 24] = True   # partial pointer tail
    valid = jax.device_put(jnp.asarray(valid), dev)
    out = np.asarray(jax.jit(fa.flash_sdpa_masked)(q, k, v, valid),
                     np.float32)
    ref = np.asarray(jax.jit(_xla_sdpa)(
        q, k, v, valid[:, None, None, :]), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


@pytest.mark.skipif(not fa._HAS_TPU_PALLAS, reason="no pallas tpu")
def test_window_qkv_interpret(rng):
    """Block-diagonal window kernel on packed qkv vs per-window XLA SDPA —
    covers the even case (win divides the query block) and the padded-window
    cases (win 49/196: block = several windows, window count padded)."""
    for heads, dim, win, nw in ((2, 72, 64, 16), (4, 24, 16, 32),
                                (2, 72, 49, 25), (1, 72, 196, 5)):
        c = heads * dim
        n = nw * win
        qkv = jnp.asarray(rng.standard_normal((1, n, 3 * c)) * 0.5,
                          jnp.float32)
        got = fa.flash_sdpa_window_qkv(qkv, heads=heads, win=win,
                                       interpret=True)
        # reference: split heads, per-window batch SDPA
        q, k, v = (qkv[0, :, i * c:(i + 1) * c].reshape(nw, win, heads, dim)
                   .transpose(0, 2, 1, 3) for i in range(3))
        ref = _xla_sdpa(q, k, v)                       # [nw, heads, win, dim]
        ref = ref.transpose(0, 2, 1, 3).reshape(1, n, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"win={win}")


def test_window_sdpa_qkv_routing(monkeypatch, rng):
    """The hiera-facing dispatch: declines on CPU/xla-impl/small inputs and
    (via monkeypatch) routes the flattened window-major stream through the
    kernel with win == t."""
    from no_time_to_train_tpu.ops import attention as att
    qkv = jnp.asarray(rng.standard_normal((8, 64, 3 * 144)), jnp.float32)
    # CPU default device -> None
    assert att.window_sdpa_qkv(qkv, heads=2, win=64) is None
    calls = {}

    def fake_kernel(x, *, heads, win):
        calls["shape"] = x.shape
        calls["win"] = win
        return x[..., :x.shape[-1] // 3]

    monkeypatch.setattr("no_time_to_train_tpu.ops.flash_attention."
                        "flash_sdpa_window_qkv", fake_kernel)
    monkeypatch.setattr(att, "_default_device_is_cpu", lambda: False)
    import jax as _jax
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    out = att.window_sdpa_qkv(qkv, heads=2, win=64, impl="pallas",
                              min_tokens=256)
    assert out.shape == (8, 64, 144)
    assert calls["shape"] == (1, 512, 3 * 144) and calls["win"] == 64
    # xla impl -> None; win != t -> None; below min_tokens -> None
    assert att.window_sdpa_qkv(qkv, heads=2, win=64, impl="xla",
                               min_tokens=256) is None
    assert att.window_sdpa_qkv(qkv, heads=2, win=32, impl="pallas",
                               min_tokens=256) is None
    assert att.window_sdpa_qkv(qkv, heads=2, win=64,
                               impl="pallas") is None  # 512 < 4096 default


def test_window_qkv_tpu_parity():
    """Compiled window kernel vs XLA reference on the real TPU at the
    flagship stage-1 and padded stage-4 shapes."""
    import jax
    dev = next((d for d in jax.devices() if d.platform != "cpu"), None)
    if dev is None:
        pytest.skip("no TPU device available")
    rng = np.random.default_rng(5)
    for heads, dim, win, nw in ((2, 72, 64, 256), (16, 72, 49, 25)):
        c = heads * dim
        n = nw * win
        qkv = jax.device_put(jnp.asarray(
            rng.standard_normal((1, n, 3 * c)) * 0.5, jnp.bfloat16), dev)
        got = np.asarray(
            fa.flash_sdpa_window_qkv(qkv, heads=heads, win=win), np.float32)
        q, k, v = (qkv[0, :, i * c:(i + 1) * c].reshape(nw, win, heads, dim)
                   .transpose(0, 2, 1, 3) for i in range(3))
        ref = np.asarray(jax.jit(_xla_sdpa)(q, k, v), np.float32)
        ref = ref.transpose(0, 2, 1, 3).reshape(1, n, c)
        np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2,
                                   err_msg=f"win={win}")
