"""Prompt encoder (reference sam2/modeling/sam/prompt_encoder.py, flax NHWC).

Vectorized for the grid-decode hot path: the torch reference mutates the point
embedding tensor with boolean-index adds (:95-100); here the label-conditional
embeddings are a one-hot matmul so the whole thing vmaps/jits over thousands of
point prompts with static shapes.
"""
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from no_time_to_train_tpu.models.sam2.common import LayerNorm2d
from no_time_to_train_tpu.models.sam2.pos_enc import random_pe_coords, random_pe_grid


class PromptEncoder(nn.Module):
    embed_dim: int
    image_embedding_size: Tuple[int, int]
    input_image_size: Tuple[int, int]
    mask_in_chans: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # matches PositionEmbeddingRandom(embed_dim // 2): buffer [2, C/2]
        self.pe_gaussian = self.param(
            "pe_gaussian",
            lambda key, shape: jnp.asarray(
                nn.initializers.normal(1.0)(key, shape)), (2, self.embed_dim // 2))
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))

        self.mask_conv1 = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                                  name="mask_downscaling_0", dtype=self.dtype)
        self.mask_norm1 = LayerNorm2d(name="mask_downscaling_1", dtype=self.dtype)
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                                  name="mask_downscaling_3", dtype=self.dtype)
        self.mask_norm2 = LayerNorm2d(name="mask_downscaling_4", dtype=self.dtype)
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1),
                                  name="mask_downscaling_6", dtype=self.dtype)

    def no_mask_dense(self):
        """The constant no-mask dense embedding at batch 1 [1, h, w, C] —
        grid decode keeps the image side un-broadcast so shared projections
        compute once."""
        h, w = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1).astype(self.dtype),
            (1, h, w, self.embed_dim))

    def get_dense_pe(self):
        h, w = self.image_embedding_size
        return random_pe_grid(h, w, self.pe_gaussian).astype(self.dtype)  # [H, W, C]

    def _embed_points(self, points, labels, pad: bool):
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((points.shape[0], 1, 2), points.dtype)], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1)
        h, w = self.input_image_size
        coords01 = points / jnp.asarray([w, h], points.dtype)
        pe = random_pe_coords(coords01, self.pe_gaussian)
        not_a_point = (labels == -1)
        pe = jnp.where(not_a_point[..., None], 0.0, pe)
        onehot = jnp.stack(
            [(labels == i).astype(pe.dtype) for i in range(4)], axis=-1)
        pe = pe + onehot @ self.point_embeddings.astype(pe.dtype)
        pe = pe + not_a_point[..., None] * self.not_a_point_embed[0].astype(pe.dtype)
        return pe.astype(self.dtype)

    def _embed_boxes(self, boxes):
        boxes = boxes + 0.5
        coords = boxes.reshape(-1, 2, 2)
        h, w = self.input_image_size
        coords01 = coords / jnp.asarray([w, h], coords.dtype)
        pe = random_pe_coords(coords01, self.pe_gaussian)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2].astype(pe.dtype))
        pe = pe.at[:, 1, :].add(self.point_embeddings[3].astype(pe.dtype))
        return pe.astype(self.dtype)

    def _embed_masks(self, masks):
        # masks: [B, H, W, 1] NHWC
        from no_time_to_train_tpu.models.sam2.common import ACT
        x = self.mask_conv1(masks)
        x = ACT["gelu"](self.mask_norm1(x))
        x = self.mask_conv2(x)
        x = ACT["gelu"](self.mask_norm2(x))
        return self.mask_conv3(x)

    def __call__(self, points=None, boxes=None, masks=None):
        """points: (coords [B,P,2], labels [B,P]); boxes: [B,4]; masks [B,H,W,1].
        Returns (sparse [B,N,C], dense [B,h,w,C])."""
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1
        sparse = jnp.zeros((bs, 0, self.embed_dim), self.dtype)
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=(boxes is None))],
                axis=1)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self._embed_boxes(boxes)], axis=1)
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1).astype(self.dtype),
                (bs, h, w, self.embed_dim))
        return sparse, dense
