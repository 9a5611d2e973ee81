"""FPN neck + image-encoder assembly (reference
sam2/modeling/backbones/image_encoder.py, NHWC flax rewrite)."""
from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.pos_enc import sine_pos_embed_2d
from no_time_to_train_tpu.ops.resize import resize


class FpnNeck(nn.Module):
    """1x1 lateral convs + top-down pathway on selected levels.

    Input: trunk outputs highest-res first: xs[i] has channels
    backbone_channel_list[n - i] (the channel list is lowest-res first, as in
    the reference config). Output: (features, pos) lists, highest-res first.
    """
    d_model: int
    backbone_channel_list: Sequence[int]
    num_pos_feats: int = 256
    fpn_interp_model: str = "bilinear"
    fuse_type: str = "sum"
    fpn_top_down_levels: Optional[Sequence[int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        n_levels = len(self.backbone_channel_list)
        assert len(xs) == n_levels
        n = n_levels - 1
        top_down = (list(self.fpn_top_down_levels)
                    if self.fpn_top_down_levels is not None else list(range(n_levels)))
        out = [None] * n_levels
        pos = [None] * n_levels
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1), name=f"convs_{n - i}",
                              dtype=self.dtype)(xs[i])
            if i in top_down and prev is not None:
                h, w = prev.shape[1:3]
                td = resize(prev.astype(jnp.float32), (h * 2, w * 2),
                            mode=self.fpn_interp_model).astype(lateral.dtype)
                prev = lateral + td
                if self.fuse_type == "avg":
                    prev = prev / 2
            else:
                prev = lateral
            out[i] = prev
            pe = sine_pos_embed_2d(prev.shape[1], prev.shape[2],
                                   self.num_pos_feats, dtype=prev.dtype)
            pos[i] = jnp.broadcast_to(pe[None], prev.shape[:3] + (pe.shape[-1],))
        return out, pos


class ImageEncoder(nn.Module):
    trunk: nn.Module
    neck: nn.Module
    scalp: int = 0

    def __call__(self, sample):
        features, pos = self.neck(self.trunk(sample))
        if self.scalp > 0:
            features, pos = features[: -self.scalp], pos[: -self.scalp]
        return {
            "vision_features": features[-1],
            "vision_pos_enc": pos,
            "backbone_fpn": features,
        }
