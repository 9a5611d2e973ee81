"""Correctness of the fused image<-token decoder attention Pallas pass
(ops/decoder_attention.py) — interpret mode vs the exact unfused formulation,
plus end-to-end equivalence of the TwoWayTransformer with the fused path
forced on."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from no_time_to_train_tpu.ops import decoder_attention as da


def _inputs(rng, p, n, c, i, t, dtype=jnp.float32, pk=None):
    return dict(
        keys=jnp.asarray(rng.standard_normal((pk or p, n, c)) * 0.5, dtype),
        pe_q=jnp.asarray(rng.standard_normal((n, i)) * 0.5, dtype),
        tok_k=jnp.asarray(rng.standard_normal((p, t, i)) * 0.5, dtype),
        tok_v=jnp.asarray(rng.standard_normal((p, t, i)) * 0.5, dtype),
        wq=jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32),
        bq=jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32),
        wout=jnp.asarray(rng.standard_normal((i, c)) * 0.05, jnp.float32),
        bout=jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        norm_w=jnp.asarray(rng.standard_normal(c) * 0.2 + 1, jnp.float32),
        norm_b=jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("t", [8, 11, 16])
def test_fused_i2t_norm_interpret(t):
    rng = np.random.default_rng(0)
    kw = _inputs(rng, p=4, n=256, c=256, i=128, t=t)
    got = da.fused_i2t_norm(**kw, num_heads=8, interpret=True)
    ref = da.fused_i2t_norm_xla(**kw, num_heads=8)
    assert got.shape == (4, 256, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_i2t_norm_broadcast_keys():
    """Layer-0 case: shared [1, n, C] keys, per-prompt tokens."""
    rng = np.random.default_rng(1)
    kw = _inputs(rng, p=4, n=128, c=256, i=128, t=8, pk=1)
    got = da.fused_i2t_norm(**kw, num_heads=8, interpret=True)
    ref = da.fused_i2t_norm_xla(**kw, num_heads=8)
    assert got.shape == (4, 128, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_i2t_norm_16_heads():
    """The fusible gate admits internal_dim=256/num_heads=16 (H*16 == I,
    I % 128 == 0); the segment matrices must be built from num_heads, not a
    hardcoded 8 — heads >= 8 got a zero normalizer before (ADVICE r2)."""
    rng = np.random.default_rng(6)
    kw = _inputs(rng, p=2, n=128, c=256, i=256, t=12)
    got = da.fused_i2t_norm(**kw, num_heads=16, interpret=True)
    ref = da.fused_i2t_norm_xla(**kw, num_heads=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_i2t_norm_bf16():
    rng = np.random.default_rng(2)
    kw = _inputs(rng, p=2, n=128, c=256, i=128, t=8, dtype=jnp.bfloat16)
    got = da.fused_i2t_norm(**kw, num_heads=8, interpret=True)
    ref = da.fused_i2t_norm_xla(**kw, num_heads=8)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.06, atol=0.06)


def test_transformer_fused_equals_classic(monkeypatch):
    """TwoWayTransformer output with the fused i2t pass forced on (interpret
    mode) equals the classic XLA path at decoder geometry."""
    from no_time_to_train_tpu.models.sam2.transformer import TwoWayTransformer
    rng = np.random.default_rng(3)
    d, heads, n_tok, hw_side = 256, 8, 8, 16
    tr = TwoWayTransformer(depth=2, embedding_dim=d, num_heads=heads,
                           mlp_dim=512)
    img = jnp.asarray(
        rng.standard_normal((3, hw_side, hw_side, d)) * 0.5, jnp.float32)
    pe = jnp.asarray(
        rng.standard_normal((3, hw_side, hw_side, d)) * 0.5, jnp.float32)
    toks = jnp.asarray(rng.standard_normal((3, n_tok, d)) * 0.5, jnp.float32)
    params = tr.init(jax.random.PRNGKey(0), img, pe, toks)

    q_ref, k_ref = tr.apply(params, img, pe, toks)

    from no_time_to_train_tpu.ops import upscale_product as up
    monkeypatch.setattr(up, "default_device_is_cpu", lambda: False)
    monkeypatch.setattr(da, "_INTERPRET", True)
    q_fused, k_fused = tr.apply(params, img, pe, toks)

    np.testing.assert_allclose(np.asarray(q_fused), np.asarray(q_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(k_fused), np.asarray(k_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t,pk", [(8, 4), (11, 4), (16, 1)])
def test_fused_t2i_attn_interpret(t, pk):
    rng = np.random.default_rng(4)
    p, n, c, i = 4, 256, 256, 128
    kw = dict(
        keys=jnp.asarray(rng.standard_normal((pk, n, c)) * 0.5, jnp.float32),
        pe_k=jnp.asarray(rng.standard_normal((n, i)) * 0.5, jnp.float32),
        tok_q=jnp.asarray(rng.standard_normal((p, t, i)) * 0.5, jnp.float32),
        wk=jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32),
        bk=jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32),
        wv=jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32),
        bv=jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32),
    )
    got = da.fused_t2i_attn(**kw, num_heads=8, interpret=True, pos_block=64)
    ref = da.fused_t2i_attn_xla(**kw, num_heads=8)
    assert got.shape == (p, t, i)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_t2i_attn_bf16():
    rng = np.random.default_rng(5)
    p, n, c, i, t = 2, 128, 256, 128, 8
    kw = dict(
        keys=jnp.asarray(rng.standard_normal((p, n, c)) * 0.5, jnp.bfloat16),
        pe_k=jnp.asarray(rng.standard_normal((n, i)) * 0.5, jnp.bfloat16),
        tok_q=jnp.asarray(rng.standard_normal((p, t, i)) * 0.5, jnp.bfloat16),
        wk=jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32),
        bk=jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32),
        wv=jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32),
        bv=jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32),
    )
    got = da.fused_t2i_attn(**kw, num_heads=8, interpret=True, pos_block=64)
    ref = da.fused_t2i_attn_xla(**kw, num_heads=8)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.06, atol=0.06)


def _tpu_device():
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    return tpus[0] if tpus else None


def test_fused_i2t_norm_tpu_parity():
    """Compiled (non-interpret) kernel vs the XLA reference on the real TPU
    at decoder geometry (the conftest pins default device to CPU, so commit
    the operands to the TPU explicitly)."""
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU device available")
    rng = np.random.default_rng(10)
    kw = _inputs(rng, p=8, n=4096, c=256, i=128, t=8, dtype=jnp.bfloat16)
    kw = {k: jax.device_put(v, dev) for k, v in kw.items()}
    got = np.asarray(jax.jit(
        lambda **a: da.fused_i2t_norm(**a, num_heads=8))(**kw), np.float32)
    ref = np.asarray(jax.jit(
        lambda **a: da.fused_i2t_norm_xla(**a, num_heads=8))(**kw),
        np.float32)
    np.testing.assert_allclose(got, ref, atol=0.08, rtol=0.08)


def test_fused_t2i_attn_tpu_parity():
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU device available")
    rng = np.random.default_rng(11)
    p, n, c, i, t = 8, 4096, 256, 128, 8
    kw = dict(
        keys=jnp.asarray(rng.standard_normal((p, n, c)) * 0.5, jnp.bfloat16),
        pe_k=jnp.asarray(rng.standard_normal((n, i)) * 0.5, jnp.bfloat16),
        tok_q=jnp.asarray(rng.standard_normal((p, t, i)) * 0.5, jnp.bfloat16),
        wk=jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32),
        bk=jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32),
        wv=jnp.asarray(rng.standard_normal((c, i)) * 0.05, jnp.float32),
        bv=jnp.asarray(rng.standard_normal(i) * 0.1, jnp.float32),
    )
    kw = {k: jax.device_put(v, dev) for k, v in kw.items()}
    got = np.asarray(jax.jit(
        lambda **a: da.fused_t2i_attn(**a, num_heads=8))(**kw), np.float32)
    ref = np.asarray(jax.jit(
        lambda **a: da.fused_t2i_attn_xla(**a, num_heads=8))(**kw),
        np.float32)
    np.testing.assert_allclose(got, ref, atol=0.08, rtol=0.08)


def test_fused_kernels_under_shard_map_tpu():
    """The multi-chip path traces the decode (and its Pallas kernels) inside
    shard_map (parallel/mesh.py); validate Pallas-under-shard_map on the real
    device with a single-device mesh at decoder geometry."""
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU device available")
    from jax.sharding import Mesh, PartitionSpec as P
    from no_time_to_train_tpu.parallel.mesh import shard_map

    rng = np.random.default_rng(12)
    p, n, c, i, t = 4, 4096, 256, 128, 8
    kw = _inputs(rng, p=p, n=n, c=c, i=i, t=t, dtype=jnp.bfloat16)
    kw = {k: jax.device_put(v, dev) for k, v in kw.items()}
    mesh = Mesh(np.array([dev]), ("data",))

    def f(keys, pe_q, tok_k, tok_v, wq, bq, wout, bout, norm_w, norm_b):
        return da.fused_i2t_norm(keys, pe_q, tok_k, tok_v, wq, bq, wout,
                                 bout, norm_w, norm_b, num_heads=8)

    # check_vma=False matches parallel/mesh.py: pallas_call declares no
    # varying-mesh-axes metadata and newer jax rejects it otherwise
    sharded = shard_map(
        f, mesh,
        in_specs=(P("data"),) + (P(),) * 9,
        out_specs=P("data"), check_vma=False)
    order = ("keys", "pe_q", "tok_k", "tok_v", "wq", "bq", "wout", "bout",
             "norm_w", "norm_b")
    got = np.asarray(jax.jit(sharded)(*[kw[k] for k in order]), np.float32)
    ref = np.asarray(jax.jit(
        lambda **a: da.fused_i2t_norm_xla(**a, num_heads=8))(**kw),
        np.float32)
    np.testing.assert_allclose(got, ref, atol=0.08, rtol=0.08)


def test_fused_i2t_norm_pair_interpret():
    """The image-PAIR broadcast i2t kernel (both images inside each grid
    step — the in-kernel batching experiment, tools/bench_pair_kernel.py)
    equals vmap of the single-image kernel / the XLA reference per image."""
    rng = np.random.default_rng(3)
    p, n, c, i, t, h = 8, 256, 256, 128, 8, 8
    keys2 = jnp.asarray(rng.standard_normal((2, n, c)) * .5, jnp.float32)
    pe2 = jnp.asarray(rng.standard_normal((2, n, i)) * .5, jnp.float32)
    tk2 = jnp.asarray(rng.standard_normal((2, p, t, i)) * .5, jnp.float32)
    tv2 = jnp.asarray(rng.standard_normal((2, p, t, i)) * .5, jnp.float32)
    kw = _inputs(np.random.default_rng(4), p, n, c, i, t)
    shared = {k: kw[k] for k in ("wq", "bq", "wout", "bout", "norm_w",
                                 "norm_b")}
    got = da.fused_i2t_norm_pair(keys2, pe2, tk2, tv2, **shared,
                                 num_heads=h, pos_block=128, interpret=True)
    assert got.shape == (2, p, n, c)
    for j in range(2):
        ref = da.fused_i2t_norm_xla(keys2[j][None], pe2[j], tk2[j], tv2[j],
                                    **shared, num_heads=h)
        np.testing.assert_allclose(np.asarray(got[j]), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5, err_msg=f"img {j}")


def test_fused_i2t_norm_prompt_pair_interpret(monkeypatch):
    """The opt-in prompt-pair broadcast body (NTTT_PROMPT_PAIR=1;
    measured-and-rejected on device, kept reproducible) equals the default
    single-prompt kernel."""
    monkeypatch.setenv("NTTT_PROMPT_PAIR", "1")
    rng = np.random.default_rng(6)
    p, n, c, i, t = 8, 256, 256, 128, 8
    kw = _inputs(rng, p, n, c, i, t, pk=1)
    assert da._prompt_pair_enabled()
    got = da.fused_i2t_norm(**kw, num_heads=8, pos_block=128,
                            interpret=True)
    ref = da.fused_i2t_norm_xla(**kw, num_heads=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    monkeypatch.setenv("NTTT_PROMPT_PAIR", "0")
    assert not da._prompt_pair_enabled()


def test_perprompt_pair_interpret(monkeypatch):
    """Opt-in per-prompt pair bodies (NTTT_PERPROMPT_PAIR=1; isolated i2t
    win 3.67 vs 4.01 ms but e2e measured-and-rejected) equal the default
    kernels for both i2t and t2i."""
    rng = np.random.default_rng(9)
    p, n, c, i, t = 8, 256, 256, 128, 8
    kw = _inputs(rng, p, n, c, i, t)
    monkeypatch.setenv("NTTT_PERPROMPT_PAIR", "1")
    assert da._perprompt_pair_enabled()
    got = da.fused_i2t_norm(**kw, num_heads=8, pos_block=128,
                            interpret=True)
    ref = da.fused_i2t_norm_xla(**kw, num_heads=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    t2i_kw = dict(keys=kw["keys"], pe_k=kw["pe_q"], tok_q=kw["tok_k"],
                  wk=kw["wq"], bk=kw["bq"], wv=kw["wout"].T, bv=kw["bq"])
    got = da.fused_t2i_attn(**t2i_kw, num_heads=8, pos_block=128,
                            interpret=True)
    ref = da.fused_t2i_attn_xla(**t2i_kw, num_heads=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
