"""Face-Caption Fusion Module (FCFM) networks, flax/NHWC.

Behavioral equivalents of reference models/fusion_nets.py. The flagship BERT
fusion net (the reference's `Working`, prepared for fusion_type="fcfm":
utils/prepare.py:112-113) is named `FCFM` here; `WordLevelCFA_LSTM`,
`LinearFusion`, `ParagraphLevelCFA` and `ConcatAttention` complete the surface.

Conventions: local image maps are NHWC (B, 14, 14, C); word features are
(B, F, T) matching the text-head output (reference convention).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from text_guided_face_recognition_tpu.models.layers import (
    LayerNormCHW,
    SelfAttention2D,
    TorchMultiheadAttention,
)

Dtype = Any

__all__ = ["LinearFusion", "FCFM", "WordLevelCFA_LSTM", "ParagraphLevelCFA",
           "ConcatAttention"]


def _max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=2) — stride defaults to kernel size."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class LinearFusion(nn.Module):
    """concat(img 256, sent 256) -> Dense(fusion_final_dim)
    (reference: models/fusion_nets.py:68-79)."""

    fusion_final_dim: int = 640
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_features: jnp.ndarray,
                 sent_emb: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([img_features, sent_emb], axis=1)
        return nn.Dense(self.fusion_final_dim, dtype=self.dtype, name="fc1")(x)


class FCFM(nn.Module):
    """BERT-path fusion net (reference `Working`: models/fusion_nets.py:217-258).

    local path: img (B,14,14,256) -> conv3x3 valid -> 36ch 12x12 -> ReLU ->
    maxpool2 (6x6) -> BN;  words (B,256,T) -> Dense 256->36 -> Gram matrix
    (36x36)/sqrt(36) -> reshape 36ch 6x6 -> BN;  SelfAttention(img, word) ->
    LayerNorm -> maxpool2 -> flatten 324 -> Dense 128;
    output: concat[128, LN(global_img 256), LN(sent 256)] = 640.
    """

    channel_dim: int = 36
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, word: jnp.ndarray,
                 gl_img: jnp.ndarray, sent: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        c = self.channel_dim
        img = nn.Conv(c, (3, 3), padding="VALID", dtype=self.dtype,
                      name="conv")(img.astype(self.dtype))      # (B,12,12,36)
        img = _max_pool2(nn.relu(img))                          # (B,6,6,36)
        img = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn_img")(img)

        w = jnp.swapaxes(word, 1, 2).astype(self.dtype)          # (B, T, 256)
        w = nn.Dense(c, dtype=self.dtype, name="projection")(w)  # (B, T, 36)
        gram = jnp.einsum("bti,btj->bij", w, w,
                          preferred_element_type=jnp.float32)    # (B, 36, 36)
        gram = (gram / jnp.sqrt(jnp.float32(c))).astype(self.dtype)
        # reshape the second 36 axis into a 6x6 grid, channels = first axis
        s = int(round(c ** 0.5))
        assert s * s == c, "channel_dim must be a perfect square (36)"
        wmap = gram.reshape(gram.shape[0], c, s, s)              # (B, 36, 6, 6)
        wmap = jnp.transpose(wmap, (0, 2, 3, 1))                 # NHWC
        wmap = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn_word")(wmap)

        iw = SelfAttention2D(c, scale=1, dtype=self.dtype, name="sa")(img, wmap)
        iw = LayerNormCHW((s, s, c), name="ln")(iw)
        iw = _max_pool2(iw)                                      # (B,3,3,36)
        # reference flattens NCHW (C,H,W); transpose before reshape for
        # weight-conversion compatibility
        iw = jnp.transpose(iw, (0, 3, 1, 2)).reshape(iw.shape[0], -1)  # 324
        iw = nn.Dense(128, dtype=self.dtype, name="linear")(iw)

        gl = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="ln_gl_image")(gl_img.astype(self.dtype))
        st = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="ln_sent")(sent.astype(self.dtype))
        return jnp.concatenate([iw, gl, st], axis=1)             # (B, 640)


class WordLevelCFA_LSTM(nn.Module):
    """LSTM-path fusion net (reference: models/fusion_nets.py:260-291).

    Pads the 14x14 local map into a 16x16 zero canvas (the reference allocates
    it on a hard-coded CUDA device: models/fusion_nets.py:276), builds a
    256x256 word Gram map reshaped to 16x16, applies two self-attention passes
    with LayerNorms, avg-pools by 8 and projects 1024 -> 768.
    """

    channel_dim: int = 256
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, local_img: jnp.ndarray, word: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        b = local_img.shape[0]
        c = self.channel_dim
        img = jnp.zeros((b, 16, 16, c), self.dtype)
        img = img.at[:, 1:15, 1:15, :].set(local_img.astype(self.dtype))

        # word: (B, 256, T) -> Gram (B, 256, 256) / sqrt(C) -> (B, 16, 16, 256)
        gram = jnp.einsum("bct,bdt->bcd", word, word,
                          preferred_element_type=jnp.float32)
        gram = (gram / jnp.sqrt(jnp.float32(c))).astype(self.dtype)
        wmap = jnp.transpose(gram.reshape(b, c, 16, 16), (0, 2, 3, 1))

        sa = SelfAttention2D(c, scale=self.scale, dtype=self.dtype, name="sa")
        img2 = sa(img, img)
        _ = LayerNormCHW((16, 16, c), name="ln1")(img2)  # reference :283 computes
        # ln1 but feeds the *un-normalized* attention output onward — preserved
        iw = sa(img2, wmap)
        iw = LayerNormCHW((16, 16, c), name="ln2")(iw)
        iw = nn.avg_pool(iw, (8, 8), strides=(8, 8))             # (B,2,2,256)
        iw = jnp.transpose(iw, (0, 3, 1, 2)).reshape(b, -1)      # 1024, NCHW order
        return nn.Dense(768, dtype=self.dtype, name="linear")(iw)


class ParagraphLevelCFA(nn.Module):
    """Sentence -> image-patch attention pooling
    (reference: models/fusion_nets.py:295-311; unused by entry points, kept as
    capability surface). The reference declares MHA with embed_dim=128 but
    feeds 64-d inputs (it would fail if called); here embed_dim follows the
    input so the module is actually usable — documented deviation."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, sent_emb: jnp.ndarray) -> jnp.ndarray:
        b = img.shape[0]
        img_p = img.reshape(b, 8, 64)
        sent_p = sent_emb.reshape(b, -1, 64)[:, :1, :]
        out = TorchMultiheadAttention(64, 1, dtype=self.dtype, name="mha")(
            sent_p, img_p, img_p)
        return out.reshape(b, -1)


class ConcatAttention(nn.Module):
    """MHA over [img(512), sent(256)] as three 256-d patches -> Dense 768->512
    (reference: models/fusion_nets.py:315-327; unused, capability surface)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, sent_emb: jnp.ndarray) -> jnp.ndarray:
        b = img.shape[0]
        patch = jnp.concatenate([img, sent_emb], axis=1).reshape(b, 3, 256)
        patch = TorchMultiheadAttention(256, 1, dtype=self.dtype, name="mha")(
            patch, patch, patch)
        patch = patch.reshape(b, -1)
        return nn.Dense(512, dtype=self.dtype, name="linear")(patch)
