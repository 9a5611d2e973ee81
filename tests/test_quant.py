"""Int8 W8A8 encoder-GEMM path (ops/quant.py) — numeric-drift bounds and
param-tree compatibility.

The quant path is opt-in (`MatchingConfig.encoder_quant="int8"`); these
tests bound its numeric drift on random weights and pin the property that
makes it a safe drop-in: the param tree is byte-identical in structure to
the unquantized model, so converted torch checkpoints load unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from no_time_to_train_tpu.ops.quant import Int8Dense, int8_dot
from no_time_to_train_tpu.config.presets import EncoderConfig


def test_int8_dot_error_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 256)).astype(np.float32)
    w = (rng.normal(size=(256, 128)) / 16).astype(np.float32)
    ref = x @ w
    got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(w)))
    # dynamic absmax W8A8: relative error on gaussian data is ~0.1-1%
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # zero rows / zero channels must not produce NaN/Inf
    x[3] = 0.0
    w[:, 7] = 0.0
    got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(w)))
    assert np.isfinite(got).all()
    assert np.abs(got[3]).max() == 0.0 and np.abs(got[:, 7]).max() == 0.0


def test_int8_dense_param_tree_matches_nn_dense():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 32))
    pd = nn.Dense(16).init(key, x)
    pq = Int8Dense(16).init(key, x)
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)
    for a, b in zip(jax.tree.leaves(pd), jax.tree.leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("family", ["dinov2", "hiera"])
def test_quantized_encoder_drift(family):
    """A small encoder tower with quant="int8" stays close to its f32 output
    (cosine similarity) and reuses the identical param tree."""
    key = jax.random.PRNGKey(1)
    if family == "dinov2":
        from no_time_to_train_tpu.models.dino import DinoV2
        cfg = EncoderConfig("tiny", 56, 14, 64, 2, 2, "none",
                            init_values=1e-5)
        mod = DinoV2(cfg)
        modq = DinoV2(cfg, quant="int8")
        x = jax.random.normal(key, (1, 56, 56, 3))
    else:
        from no_time_to_train_tpu.models.sam2.hiera import Hiera
        kw = dict(embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
                  window_spec=(4, 2, 2, 2), global_att_blocks=(3,))
        mod = Hiera(**kw)
        modq = Hiera(**kw, quant="int8")
        x = jax.random.normal(key, (1, 64, 64, 3))
    params = mod.init(key, x)
    paramsq = modq.init(key, x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(paramsq))
    ref = mod.apply(params, x)
    got = modq.apply(params, x)
    refs = jax.tree.leaves(ref)
    gots = jax.tree.leaves(got)
    assert len(refs) == len(gots)
    for r, g in zip(refs, gots):
        r = np.asarray(r).ravel().astype(np.float64)
        g = np.asarray(g).ravel().astype(np.float64)
        cos = (r @ g) / (np.linalg.norm(r) * np.linalg.norm(g) + 1e-30)
        assert cos > 0.98, cos


def test_int8_dot_tpu_parity():
    """Compiled int8 dot on the real TPU vs the CPU backend.

    int32 accumulation and the f32 rescale are exact/deterministic, but the
    quantize step's `x / scale` lowers to reciprocal-multiply on the TPU, so
    values sitting exactly on a round-to-nearest tie can flip one int8 level
    vs the CPU's IEEE division (measured: 0.375% of elements, each off by
    exactly one quant step ~0.009 here). The assertion therefore bounds the
    flip magnitude and fraction rather than demanding bit-identity — while
    still catching an MXU path that silently upcasts through a lossy dtype
    (that shifts every element, not a tie-breaking few)."""
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no TPU device available")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(512, 256)) / 8).astype(np.float32))
    cpu = np.asarray(jax.jit(int8_dot)(x, w))
    xt, wt = jax.device_put(x, tpus[0]), jax.device_put(w, tpus[0])
    tpu = np.asarray(jax.jit(int8_dot)(xt, wt))
    diff = np.abs(tpu - cpu)
    # one flipped int8 level contributes xs*ks*|operand| <= ~0.05 at these
    # magnitudes; a lossy upcast would blow past this on most elements
    assert diff.max() < 0.05, diff.max()
    assert (diff > 1e-4).mean() < 0.02, (diff > 1e-4).mean()
    rel = np.linalg.norm(tpu - cpu) / np.linalg.norm(cpu)
    assert rel < 1e-3, rel


def test_pipeline_accepts_encoder_quant():
    """MatchingConfig(encoder_quant="int8") builds and runs the tiny-config
    test step end-to-end (CPU): the flag reaches both towers."""
    import dataclasses
    from no_time_to_train_tpu.config.presets import SAM2_PRESETS
    from no_time_to_train_tpu.models.matching.pipeline import (
        NoAMGMatcher, MatchingConfig)
    from no_time_to_train_tpu.models.matching import memory_bank as mb

    sam_cfg = dataclasses.replace(SAM2_PRESETS["sam2_hiera_t.yaml"],
                                  image_size=256)
    enc_cfg = EncoderConfig("tiny", 56, 14, 32, 2, 2, "local")
    mcfg = MatchingConfig(points_per_side=8, testing_point_bs=16,
                          num_out_instance=10, encoder_quant="int8")
    m = NoAMGMatcher(sam_cfg, enc_cfg, mcfg, n_classes=3, memory_length=2)
    m.bank = mb.postprocess(m.bank)
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (256, 256, 3)))
    out = m.test(img)
    assert np.isfinite(np.asarray(out["scores"])).all()
