"""FCAM image-side projection heads (reference: models/models.py:328-405).

NHWC throughout. `ImageHeading` projects the frozen backbone's global 512-d
feature to the shared 256-d space and refines the 14x14 local map through IMIM
(BN -> self-attention -> LayerNorm -> bottleneck convs -> projection).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from text_guided_face_recognition_tpu.models.layers import (
    LayerNormCHW,
    ProjectionHead,
    SelfAttention2D,
    l2_normalize,
)

Dtype = Any

__all__ = ["IMIM", "ImageHeading"]


class IMIM(nn.Module):
    """Intra-Modal Image Modulation on the local map
    (reference: models/models.py:380-405). Input/output (B, 14, 14, 256);
    output channel-l2-normalized."""

    channel_dim: int = 256
    feat_dim: int = 256
    spatial: int = 14
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        img = img.astype(self.dtype)
        img = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn_img")(img)
        img = SelfAttention2D(self.channel_dim, scale=1, dtype=self.dtype,
                              name="sa")(img, img)
        img = LayerNormCHW((self.spatial, self.spatial, self.channel_dim),
                           name="ln")(img)
        img = nn.Conv(self.channel_dim // 2, (1, 1), dtype=self.dtype,
                      name="conv1x1_1")(img)
        img = nn.relu(img)
        img = nn.Conv(self.channel_dim, (1, 1), dtype=self.dtype,
                      name="conv1x1_2")(img)
        img = nn.relu(img)
        img = ProjectionHead(self.feat_dim, dtype=self.dtype,
                             name="project_local")(img)
        # ProjectionHead already l2-normalizes; the reference normalizes once
        # more (models/models.py:403) — idempotent, kept for exactness
        return l2_normalize(img, axis=-1)


class ImageHeading(nn.Module):
    """Global + local FCAM image head (reference: models/models.py:328-338)."""

    feat_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, global_image: jnp.ndarray, local_image: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        local_image = IMIM(channel_dim=local_image.shape[-1],
                           feat_dim=self.feat_dim,
                           spatial=local_image.shape[1], dtype=self.dtype,
                           name="imim")(local_image, train)
        global_image = ProjectionHead(self.feat_dim, dtype=self.dtype,
                                      name="project_global")(
            global_image.astype(self.dtype))
        return global_image, local_image
