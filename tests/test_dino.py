"""DINOv2 flax parity vs HF transformers Dinov2Model (random weights)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import jax.numpy as jnp  # noqa: E402

from no_time_to_train_tpu.config.presets import EncoderConfig  # noqa: E402
from no_time_to_train_tpu.models.dino import DinoV2, convert_hf_dinov2  # noqa: E402
from no_time_to_train_tpu.utils.torch_convert import torch_sd_to_numpy  # noqa: E402


def _make(img_size=56, patch=14, dim=64, depth=2, heads=2, seed=0):
    from transformers import Dinov2Config, Dinov2Model
    hf_cfg = Dinov2Config(hidden_size=dim, num_hidden_layers=depth,
                          num_attention_heads=heads, image_size=img_size,
                          patch_size=patch, layerscale_value=1e-5)
    t = Dinov2Model(hf_cfg)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in t.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    t.eval()
    cfg = EncoderConfig("test", img_size, patch, dim, depth, heads, "local")
    return t, cfg


def test_dinov2_parity():
    t, cfg = _make()
    g = torch.Generator().manual_seed(20)
    x = torch.randn(2, 3, cfg.img_size, cfg.img_size, generator=g)
    with torch.no_grad():
        ref = t(pixel_values=x).last_hidden_state.numpy()

    m = DinoV2(cfg)
    params = convert_hf_dinov2(torch_sd_to_numpy(t), cfg)
    got = m.apply({"params": params},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                  drop_prefix_tokens=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)

    # NTTT skips CLS (+registers); our drop matches [:, 1:, :]
    got_p = m.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_p), ref[:, 1:], atol=5e-4,
                               rtol=1e-3)
