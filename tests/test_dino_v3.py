"""DINOv3 flax parity vs HF DINOv3ViTModel (random weights, plain+gated MLP)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from no_time_to_train_tpu.config.presets import EncoderConfig  # noqa: E402
from no_time_to_train_tpu.models.dino_v3 import DinoV3, convert_hf_dinov3  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import torch_sd_to_numpy  # noqa: E402


def _make(gated, img=64, patch=16, dim=64, depth=2, heads=2, seed=0):
    from transformers.models.dinov3_vit import (configuration_dinov3_vit as C,
                                                modeling_dinov3_vit as M)
    hf_cfg = C.DINOv3ViTConfig(
        hidden_size=dim, num_hidden_layers=depth, num_attention_heads=heads,
        intermediate_size=dim * 4, image_size=img, patch_size=patch,
        num_register_tokens=4, use_gated_mlp=gated, rope_theta=100.0,
        layerscale_value=1e-5, hidden_act="gelu")
    t = M.DINOv3ViTModel(hf_cfg)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in t.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    t.eval()
    cfg = EncoderConfig("t3", img, patch, dim, depth, heads, "local",
                        num_register_tokens=4, family="dinov3")
    return t, cfg


@pytest.mark.parametrize("gated", [False, True])
def test_dinov3_parity(gated):
    t, cfg = _make(gated)
    g = torch.Generator().manual_seed(5)
    x = torch.randn(2, 3, cfg.img_size, cfg.img_size, generator=g)
    with torch.no_grad():
        ref = t(pixel_values=x).last_hidden_state.numpy()

    m = DinoV3(cfg, use_gated_mlp=gated)
    params = convert_hf_dinov3(torch_sd_to_numpy(t), cfg, use_gated_mlp=gated)
    got = m.apply({"params": params},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                  drop_prefix_tokens=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-2)

    got_p = m.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_p), ref[:, 5:], atol=1e-3,
                               rtol=1e-2)
