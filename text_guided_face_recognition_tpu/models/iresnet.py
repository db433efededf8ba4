"""ArcFace-style iResNet face backbones (insightface family), flax/NHWC.

Behavioral equivalent of the reference backbone (reference: models/iresnet.py):
BN-Conv-BN-PReLU-Conv-BN residual blocks with stride-2 first block per stage,
3x3 stride-1 stem, and the dual output contract the whole pipeline relies on —
`(global 512-d feature, local 256-ch 14x14 map taken after layer3)`
(models/iresnet.py:149-166, `lc_feats = x` at :157).

TPU-native design:
  * NHWC layout + bf16 compute dtype (params fp32) — convs tile onto the MXU.
  * BatchNorm runs from running statistics when `train=False` (the backbone is
    frozen + eval in the whole pipeline: utils/prepare.py:51-63); when frozen
    we pre-fold BN into scale/shift at load time is left to XLA constant
    folding under jit.
  * Optional per-block rematerialization (`remat=True`) replaces the
    reference's latent torch checkpoint flag (models/iresnet.py:6,60-64).
  * Final fc stays fp32 (the reference upcasts before fc when fp16:
    models/iresnet.py:163).

The `features` BatchNorm1d has its scale frozen at 1.0 in the reference
(models/iresnet.py:107-109); we use a scale-free BatchNorm (use_scale=False)
which is numerically identical.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from text_guided_face_recognition_tpu.models.layers import PReLU

Dtype = Any

__all__ = ["IResNet", "iresnet18", "iresnet34", "iresnet50", "iresnet100", "iresnet200"]


def conv3x3(features: int, stride: int = 1, dtype: Dtype = jnp.float32,
            name: str | None = None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=1,
                   use_bias=False, dtype=dtype, name=name)


def conv1x1(features: int, stride: int = 1, dtype: Dtype = jnp.float32,
            name: str | None = None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride), padding=0,
                   use_bias=False, dtype=dtype, name=name)


class IBasicBlock(nn.Module):
    """BN -> conv3x3 -> BN -> PReLU -> conv3x3(stride) -> BN (+shortcut)
    (reference: models/iresnet.py:29-64)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        out = bn(name="bn1")(x)
        out = conv3x3(self.planes, dtype=self.dtype, name="conv1")(out)
        out = bn(name="bn2")(out)
        out = PReLU(self.planes, name="prelu")(out)
        out = conv3x3(self.planes, self.stride, dtype=self.dtype, name="conv2")(out)
        out = bn(name="bn3")(out)
        if self.downsample:
            identity = conv1x1(self.planes, self.stride, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        else:
            identity = x
        return out + identity


class IResNet(nn.Module):
    """Four-stage iResNet; `__call__` returns (embedding, local_map).

    local_map is NHWC: (B, 14, 14, 256) for 112x112 input — callers that need
    the reference's NCHW convention use `jnp.transpose(..., (0, 3, 1, 2))`.
    """

    layers: Sequence[int]
    dropout: float = 0.0
    num_features: int = 512
    dtype: Dtype = jnp.float32
    remat: bool = False  # per-block activation rematerialization

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        block_cls = IBasicBlock
        if self.remat:
            block_cls = nn.remat(IBasicBlock, static_argnums=(2,))

        x = x.astype(self.dtype)
        x = conv3x3(64, 1, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = PReLU(64, name="prelu")(x)

        local_map = None
        planes = (64, 128, 256, 512)
        for stage, (p, n_blocks) in enumerate(zip(planes, self.layers), start=1):
            for i in range(n_blocks):
                stride = 2 if i == 0 else 1
                downsample = i == 0  # stride-2 entry always changes shape
                x = block_cls(p, stride, downsample, self.dtype,
                              name=f"layer{stage}_{i}")(x, train)
            if stage == 3:
                local_map = x  # (B, 14, 14, 256) — reference :157

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        x = x.reshape(x.shape[0], -1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        # fc + features-BN in fp32 (reference upcasts before fc under fp16)
        x = nn.Dense(self.num_features, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_scale=False, dtype=jnp.float32,
                         name="features")(x)
        return x, local_map


def iresnet18(**kw) -> IResNet:
    return IResNet(layers=(2, 2, 2, 2), **kw)


def iresnet34(**kw) -> IResNet:
    return IResNet(layers=(3, 4, 6, 3), **kw)


def iresnet50(**kw) -> IResNet:
    return IResNet(layers=(3, 4, 14, 3), **kw)


def iresnet100(**kw) -> IResNet:
    return IResNet(layers=(3, 13, 30, 3), **kw)


def iresnet200(**kw) -> IResNet:
    return IResNet(layers=(6, 26, 60, 6), **kw)
