"""Numeric parity of SAM2 flax modules vs reference torch modules (random
weights, shared via utils/torch_convert). CPU, small configs."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import install_reference_shim, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("reference repo not available", allow_module_level=True)
install_reference_shim()

from sam2.modeling.backbones.hieradet import Hiera as THiera  # noqa: E402
from sam2.modeling.backbones.image_encoder import FpnNeck as TFpnNeck  # noqa: E402
from sam2.modeling.position_encoding import PositionEmbeddingSine  # noqa: E402
from sam2.modeling.sam.prompt_encoder import PromptEncoder as TPromptEncoder  # noqa: E402
from sam2.modeling.sam.transformer import TwoWayTransformer as TTwoWay  # noqa: E402
from sam2.modeling.sam.transformer import RoPEAttention as TRoPE  # noqa: E402
from sam2.modeling.sam.mask_decoder import MaskDecoder as TMaskDecoder  # noqa: E402
from sam2.modeling.memory_encoder import (  # noqa: E402
    MemoryEncoder as TMemoryEncoder, MaskDownSampler as TMaskDownSampler,
    Fuser as TFuser, CXBlock as TCXBlock)
from sam2.modeling.memory_attention import (  # noqa: E402
    MemoryAttention as TMemoryAttention, MemoryAttentionLayer as TMemLayer)

from no_time_to_train_tpu.models.sam2.hiera import Hiera  # noqa: E402
from no_time_to_train_tpu.models.sam2.neck import FpnNeck  # noqa: E402
from no_time_to_train_tpu.models.sam2.prompt_encoder import PromptEncoder  # noqa: E402
from no_time_to_train_tpu.models.sam2.transformer import TwoWayTransformer  # noqa: E402
from no_time_to_train_tpu.models.sam2.mask_decoder import MaskDecoder  # noqa: E402
from no_time_to_train_tpu.models.sam2.memory_encoder import (  # noqa: E402
    MemoryEncoder, MaskDownSampler as MEMaskDownSampler)
from no_time_to_train_tpu.models.sam2.memory_attention import MemoryAttention  # noqa: E402
from no_time_to_train_tpu.models.sam2 import pos_enc  # noqa: E402
from no_time_to_train_tpu.utils import torch_convert as tc  # noqa: E402


def _seed_all(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


def test_sine_pos_embed():
    pe = PositionEmbeddingSine(num_pos_feats=64, normalize=True)
    ref = pe(torch.zeros(2, 3, 8, 10)).numpy()  # [B, C, H, W]
    got = np.asarray(pos_enc.sine_pos_embed_2d(8, 10, 64))
    np.testing.assert_allclose(got.transpose(2, 0, 1), ref[0], atol=1e-5, rtol=1e-5)


def test_rope_attention():
    t = _seed_all(TRoPE(embedding_dim=64, num_heads=2, rope_theta=10000.0,
                        feat_sizes=(4, 4)).eval())
    x = torch.randn(2, 16, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = t(x, x, x).numpy()
    from no_time_to_train_tpu.models.sam2.transformer import RoPEAttention
    m = RoPEAttention(embedding_dim=64, num_heads=2, feat_sizes=(4, 4))
    sd = tc.torch_sd_to_numpy(t)
    params = {k: {"kernel": sd[f"{k}.weight"].T, "bias": sd[f"{k}.bias"]}
              for k in ("q_proj", "k_proj", "v_proj", "out_proj")}
    got = m.apply({"params": params}, jnp.asarray(x.numpy()),
                  jnp.asarray(x.numpy()), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_hiera_tiny():
    kwargs = dict(embed_dim=32, num_heads=1, stages=(1, 2, 2, 1),
                  global_att_blocks=(4,), q_pool=3,
                  window_pos_embed_bkg_spatial_size=(2, 2),
                  window_spec=(4, 2, 4, 2))
    t = _seed_all(THiera(**kwargs).eval())
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = [o.numpy() for o in t(x)]

    m = Hiera(**kwargs)
    params = tc.convert_hiera(tc.torch_sd_to_numpy(t))
    got = m.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), r,
                                   atol=5e-4, rtol=1e-3)


def test_hiera_window_major_runs_torch_parity():
    """Geometry chosen so the window-major stage flow activates: multi-block
    uniform runs in every stage, one GLOBAL block inside a run (full
    attention is permutation-invariant, so window-major token order must
    give identical results)."""
    kwargs = dict(embed_dim=32, num_heads=1, stages=(2, 3, 4, 2),
                  global_att_blocks=(7,), q_pool=3,
                  window_pos_embed_bkg_spatial_size=(2, 2),
                  window_spec=(4, 2, 4, 2))
    t = _seed_all(THiera(**kwargs).eval())
    x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        ref = [o.numpy() for o in t(x)]

    m = Hiera(**kwargs)
    params = tc.convert_hiera(tc.torch_sd_to_numpy(t))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = m.apply({"params": params}, xj)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), r,
                                   atol=5e-4, rtol=1e-3)
    # and the token-major flow equals the forced per-block spatial path
    ms = Hiera(**kwargs, force_spatial=True)
    spatial = ms.apply({"params": params}, xj)
    for g, s in zip(got, spatial):
        np.testing.assert_allclose(np.asarray(g), np.asarray(s), atol=1e-6)


def test_hiera_flagship_depth_window_major_consistency():
    """Full Hiera-L block schedule (48 blocks, 3 globals inside stage-3
    runs) at a reduced image size: window-major flow == spatial flow."""
    kwargs = dict(embed_dim=16, num_heads=1, stages=(2, 6, 36, 4),
                  global_att_blocks=(23, 33, 43), q_pool=3,
                  window_pos_embed_bkg_spatial_size=(7, 7),
                  window_spec=(8, 4, 16, 8))
    m = Hiera(**kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 256, 256, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    got = m.apply({"params": params}, x)
    ms = Hiera(**kwargs, force_spatial=True)
    spatial = ms.apply({"params": params}, x)
    assert len(got) == 4
    for g, s in zip(got, spatial):
        np.testing.assert_allclose(np.asarray(g), np.asarray(s), atol=2e-5,
                                   rtol=1e-4)


def test_fpn_neck():
    pe = PositionEmbeddingSine(num_pos_feats=32, normalize=True)
    t = _seed_all(TFpnNeck(position_encoding=pe, d_model=32,
                           backbone_channel_list=[64, 32, 16, 8],
                           fpn_top_down_levels=[2, 3],
                           fpn_interp_model="nearest").eval())
    g = torch.Generator().manual_seed(3)
    xs = [torch.randn(1, c, s, s, generator=g)
          for c, s in [(8, 16), (16, 8), (32, 4), (64, 2)]]
    with torch.no_grad():
        ref_out, ref_pos = t(xs)

    m = FpnNeck(d_model=32, backbone_channel_list=[64, 32, 16, 8],
                num_pos_feats=32, fpn_top_down_levels=[2, 3],
                fpn_interp_model="nearest")
    params = tc.convert_fpn(tc.torch_sd_to_numpy(t))
    got_out, got_pos = m.apply(
        {"params": params},
        [jnp.asarray(x.numpy().transpose(0, 2, 3, 1)) for x in xs])
    for g_, r in zip(got_out, ref_out):
        np.testing.assert_allclose(np.asarray(g_).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=1e-4, rtol=1e-4)
    for g_, r in zip(got_pos, ref_pos):
        np.testing.assert_allclose(np.asarray(g_).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=1e-5, rtol=1e-5)


def test_prompt_encoder():
    t = _seed_all(TPromptEncoder(embed_dim=32, image_embedding_size=(8, 8),
                                 input_image_size=(64, 64), mask_in_chans=16).eval())
    g = torch.Generator().manual_seed(4)
    coords = torch.rand(5, 1, 2, generator=g) * 64
    labels = torch.ones(5, 1, dtype=torch.int32)
    with torch.no_grad():
        ref_sparse, ref_dense = t(points=(coords, labels), boxes=None, masks=None)
        ref_pe = t.get_dense_pe()

    m = PromptEncoder(embed_dim=32, image_embedding_size=(8, 8),
                      input_image_size=(64, 64), mask_in_chans=16)
    params = tc.convert_prompt_encoder(tc.torch_sd_to_numpy(t))
    got_sparse, got_dense = m.apply(
        {"params": params}, points=(jnp.asarray(coords.numpy()),
                                    jnp.asarray(labels.numpy())))
    np.testing.assert_allclose(np.asarray(got_sparse), ref_sparse.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dense).transpose(0, 3, 1, 2),
                               ref_dense.detach().numpy(), atol=1e-5, rtol=1e-5)
    got_pe = m.apply({"params": params}, method=m.get_dense_pe)
    np.testing.assert_allclose(np.asarray(got_pe).transpose(2, 0, 1),
                               ref_pe[0].detach().numpy(), atol=1e-5, rtol=1e-5)

    # mask prompts
    masks = torch.randn(5, 1, 32, 32, generator=g)
    with torch.no_grad():
        _, ref_dense_m = t(points=(coords, labels), boxes=None, masks=masks)
    _, got_dense_m = m.apply(
        {"params": params},
        points=(jnp.asarray(coords.numpy()), jnp.asarray(labels.numpy())),
        masks=jnp.asarray(masks.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_dense_m).transpose(0, 3, 1, 2),
                               ref_dense_m.detach().numpy(), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("skip_last_n", [0, 1])
def test_two_way_transformer(skip_last_n):
    t = _seed_all(TTwoWay(depth=2, embedding_dim=32, num_heads=2,
                          mlp_dim=64).eval())
    g = torch.Generator().manual_seed(5)
    img = torch.randn(2, 32, 8, 8, generator=g)
    pe = torch.randn(2, 32, 8, 8, generator=g)
    pts = torch.randn(2, 7, 32, generator=g)
    with torch.no_grad():
        ref_q, ref_k = t(img, pe, pts, skip_last_n_keys=skip_last_n)

    m = TwoWayTransformer(depth=2, embedding_dim=32, num_heads=2, mlp_dim=64)
    params = tc.convert_two_way_transformer(tc.torch_sd_to_numpy(t))
    got_q, got_k = m.apply(
        {"params": params}, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(pe.numpy().transpose(0, 2, 3, 1)), jnp.asarray(pts.numpy()),
        skip_last_n_keys=skip_last_n)
    np.testing.assert_allclose(np.asarray(got_q), ref_q.numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_k), ref_k.numpy(), atol=1e-4,
                               rtol=1e-3)


def _make_mask_decoders():
    t = TMaskDecoder(
        transformer_dim=64,
        transformer=TTwoWay(depth=2, embedding_dim=64, num_heads=2, mlp_dim=128),
        num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=32,
        use_high_res_features=True, iou_prediction_use_sigmoid=True,
        pred_obj_scores=True, pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True)
    _seed_all(t.eval())
    m = MaskDecoder(transformer_dim=64, num_multimask_outputs=3,
                    iou_head_depth=3, iou_head_hidden_dim=32,
                    use_high_res_features=True, iou_prediction_use_sigmoid=True,
                    pred_obj_scores=True, pred_obj_scores_mlp=True,
                    use_multimask_token_for_obj_ptr=True,
                    transformer_mlp_dim=128, transformer_num_heads=2)
    params = tc.convert_mask_decoder(tc.torch_sd_to_numpy(t))
    return t, m, params


def test_mask_decoder_output_all():
    t, m, params = _make_mask_decoders()
    g = torch.Generator().manual_seed(6)
    B, h, w, d = 3, 8, 8, 64
    img = torch.randn(1, d, h, w, generator=g).repeat(B, 1, 1, 1)
    pe = torch.randn(1, d, h, w, generator=g)
    sparse = torch.randn(B, 2, d, generator=g)
    dense = torch.randn(B, d, h, w, generator=g)
    hi0 = torch.randn(B, d // 8, h * 4, w * 4, generator=g)
    hi1 = torch.randn(B, d // 4, h * 2, w * 2, generator=g)
    with torch.no_grad():
        ref = t(image_embeddings=img, image_pe=pe,
                sparse_prompt_embeddings=sparse, dense_prompt_embeddings=dense,
                multimask_output=True, repeat_image=False,
                high_res_features=[hi0, hi1], return_iou_token_out=False,
                disable_custom_iou_embed=True, disable_mlp_obj_scores=True,
                output_all_masks=True)
    ref_masks, ref_ious, ref_tokens, ref_obj = [r.numpy() for r in ref]

    def nhwc(x):
        return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))

    got = m.apply({"params": params}, nhwc(img), nhwc(pe)[0],
                  jnp.asarray(sparse.numpy()), nhwc(dense),
                  multimask_output=True, repeat_image=False,
                  high_res_features=[nhwc(hi0), nhwc(hi1)],
                  output_all_masks=True)
    got_masks, got_ious, got_tokens, got_obj = got
    np.testing.assert_allclose(np.asarray(got_masks), ref_masks, atol=5e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_ious), ref_ious, atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_obj), ref_obj, atol=1e-5,
                               rtol=1e-5)


def test_memory_encoder():
    pe = PositionEmbeddingSine(num_pos_feats=16, normalize=True)
    mds = TMaskDownSampler(kernel_size=3, stride=2, padding=1, embed_dim=32)
    fus = TFuser(TCXBlock(dim=32, kernel_size=7, padding=3,
                          layer_scale_init_value=1e-6, use_dwconv=True), 2)
    t = _seed_all(TMemoryEncoder(out_dim=16, mask_downsampler=mds, fuser=fus,
                                 position_encoding=pe, in_dim=32).eval())
    g = torch.Generator().manual_seed(7)
    pix = torch.randn(1, 32, 4, 4, generator=g)
    mask = torch.randn(1, 1, 64, 64, generator=g)
    with torch.no_grad():
        ref = t(pix, mask, skip_mask_sigmoid=True)

    m = MemoryEncoder(out_dim=16, in_dim=32, pos_num_feats=16,
                      mask_downsampler_kwargs=dict(kernel_size=3, stride=2,
                                                   padding=1))
    params = tc.convert_memory_encoder(tc.torch_sd_to_numpy(t))
    got = m.apply({"params": params},
                  jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)),
                  jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)),
                  skip_mask_sigmoid=True)
    np.testing.assert_allclose(
        np.asarray(got["vision_features"]).transpose(0, 3, 1, 2),
        ref["vision_features"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got["vision_pos_enc"][0]).transpose(0, 3, 1, 2),
        ref["vision_pos_enc"][0].numpy(), atol=1e-5, rtol=1e-5)


def test_memory_attention():
    d, kv = 32, 16
    layer = TMemLayer(
        activation="relu", d_model=d, dim_feedforward=64, dropout=0.0,
        pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        self_attention=TRoPE(rope_theta=10000.0, feat_sizes=(4, 4),
                             embedding_dim=d, num_heads=1, downsample_rate=1,
                             dropout=0.0),
        cross_attention=TRoPE(rope_theta=10000.0, feat_sizes=(4, 4),
                              rope_k_repeat=True, embedding_dim=d, num_heads=1,
                              downsample_rate=1, dropout=0.0, kv_in_dim=kv))
    t = _seed_all(TMemoryAttention(d_model=d, pos_enc_at_input=True,
                                   layer=layer, num_layers=2).eval())
    g = torch.Generator().manual_seed(8)
    n_cur, n_mem = 16, 36  # mem = 2*16 spatial + 4 obj-ptr tokens
    curr = torch.randn(n_cur, 1, d, generator=g)
    curr_pos = torch.randn(n_cur, 1, d, generator=g)
    mem = torch.randn(n_mem, 1, kv, generator=g)
    mem_pos = torch.randn(n_mem, 1, kv, generator=g)
    with torch.no_grad():
        ref = t(curr=[curr], curr_pos=[curr_pos], memory=mem,
                memory_pos=mem_pos, num_obj_ptr_tokens=4).numpy()

    m = MemoryAttention(d_model=d, num_layers=2, pos_enc_at_input=True,
                        layer_kwargs=dict(dim_feedforward=64,
                                          cross_kv_in_dim=kv,
                                          rope_feat_sizes=(4, 4)))
    params = tc.convert_memory_attention(tc.torch_sd_to_numpy(t), num_layers=2)
    got = m.apply({"params": params},
                  jnp.asarray(curr.numpy().transpose(1, 0, 2)),
                  jnp.asarray(curr_pos.numpy().transpose(1, 0, 2)),
                  jnp.asarray(mem.numpy().transpose(1, 0, 2)),
                  jnp.asarray(mem_pos.numpy().transpose(1, 0, 2)),
                  num_obj_ptr_tokens=4)
    np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), ref,
                               atol=5e-4, rtol=1e-3)


def test_gelu_dispatch_numerics():
    """ACT["gelu"] must be bit-exact erf-gelu on f32 (the parity oracles'
    dtype) and within bf16 rounding of exact gelu on the bf16 compute path
    (where it takes the tanh approximation for TPU VPU speed)."""
    import jax
    import jax.numpy as jnp
    from no_time_to_train_tpu.models.sam2.common import ACT

    x32 = jnp.asarray(np.linspace(-6.0, 6.0, 4097), jnp.float32)
    exact = jax.nn.gelu(x32, approximate=False)
    np.testing.assert_array_equal(np.asarray(ACT["gelu"](x32)),
                                  np.asarray(exact))
    y16 = ACT["gelu"](x32.astype(jnp.bfloat16)).astype(jnp.float32)
    # tanh-approx deviation (~3e-3) + bf16 rounding of in/out (<= 2^-8 |x|)
    bound = 4e-3 + np.abs(np.asarray(x32)) * 2.0 ** -7
    assert float(jnp.abs(y16 - exact).max()) < 0.5  # sanity
    np.testing.assert_array_less(np.abs(np.asarray(y16 - exact)), bound)


def _downsampler_params(t, num_layers):
    sd = tc.torch_sd_to_numpy(t)
    mds = {}
    for i in range(num_layers):
        mds[f"encoder_{3 * i}"] = tc._conv(sd, f"encoder.{3 * i}")
        mds[f"encoder_{3 * i + 1}"] = tc._ln(sd, f"encoder.{3 * i + 1}")
    mds[f"encoder_{3 * num_layers}"] = tc._conv(sd, f"encoder.{3 * num_layers}")
    return mds


def test_mask_downsampler_default_config():
    """The reference MaskDownSampler defaults (k=4, s=4, p=0: two 1->16->256
    levels) take the nn.Conv fallback branch of the flax module — parity."""
    t = _seed_all(TMaskDownSampler(embed_dim=32, kernel_size=4, stride=4,
                                   padding=0).eval())
    g = torch.Generator().manual_seed(3)
    mask = torch.randn(2, 1, 64, 64, generator=g)
    with torch.no_grad():
        ref = t(mask)
    m = MEMaskDownSampler(embed_dim=32)  # module defaults = k4/s4/p0
    params = _downsampler_params(t, num_layers=2)
    got = m.apply({"params": params},
                  jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-4, rtol=1e-3)


def test_mask_downsampler_odd_dims_mixed_path():
    """k=3/s=2/p=1 at mask size 72 goes 72->36->18->9: three channel-leading
    GEMM levels then an ODD-dim level that must transpose back to NHWC and
    fall back to nn.Conv mid-pyramid — parity across the transition."""
    t = _seed_all(TMaskDownSampler(embed_dim=32, kernel_size=3, stride=2,
                                   padding=1).eval(), seed=5)
    g = torch.Generator().manual_seed(5)
    mask = torch.randn(1, 1, 72, 72, generator=g)
    with torch.no_grad():
        ref = t(mask)
    m = MEMaskDownSampler(embed_dim=32, kernel_size=3, stride=2, padding=1)
    params = _downsampler_params(t, num_layers=4)
    got = m.apply({"params": params},
                  jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)))
    assert got.shape[1:3] == ref.shape[2:]  # odd-dim conv arithmetic matches
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-4, rtol=1e-3)
