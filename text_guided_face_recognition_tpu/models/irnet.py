"""AdaFace IR / IR-SE face backbones, flax/NHWC.

Behavioral equivalent of the reference AdaFace backbone family (reference:
models/net.py): BasicBlockIR (BN-Conv-BN-PReLU-Conv(stride)-BN with
MaxPool(1, stride) identity shortcut), BottleneckIR for depths > 100, optional
SE modules, GNAP/GDC pooling heads, and the three-output contract
`(l2-normalized global feature, local map at body index 5, feature norm)`
(models/net.py:319-333).

Depth map (models/net.py:220-264): 18/34/50/100 use BasicBlockIR (512 ch out),
152/200 use BottleneckIR (2048 ch out).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from text_guided_face_recognition_tpu.models.layers import PReLU

Dtype = Any

__all__ = ["IRBackbone", "build_model", "GNAP", "GDC", "SEModule"]

_BLOCK_SPECS = {
    18: [(64, 2), (128, 2), (256, 2), (512, 2)],
    34: [(64, 3), (128, 4), (256, 6), (512, 3)],
    50: [(64, 3), (128, 4), (256, 14), (512, 3)],
    100: [(64, 3), (128, 13), (256, 30), (512, 3)],
    152: [(256, 3), (512, 8), (1024, 36), (2048, 3)],
    200: [(256, 3), (512, 24), (1024, 36), (2048, 3)],
}


class SEModule(nn.Module):
    """Squeeze-excite block (reference: models/net.py:113-138)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=False,
                    dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc2")(s)
        return x * nn.sigmoid(s)


class GNAP(nn.Module):
    """Global Norm-Aware Pooling (reference: models/net.py:70-88)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         use_bias=False, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x_norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        weight = jnp.mean(x_norm) / jnp.maximum(x_norm, 1e-12)
        x = x * weight.astype(x.dtype)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         use_bias=False, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn2")(x.astype(jnp.float32))
        return x


class GDC(nn.Module):
    """Global Depthwise Convolution head (reference: models/net.py:91-110)."""

    embedding_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        x = nn.Conv(c, (7, 7), padding=0, feature_group_count=c, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn_dw")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.embedding_size, use_bias=False, dtype=jnp.float32,
                     name="linear")(x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         use_bias=False, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return x


def _max_pool_stride(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """torch MaxPool2d(kernel=1, stride=s): pure spatial subsampling."""
    if stride == 1:
        return x
    return x[:, ::stride, ::stride, :]


class BasicBlockIR(nn.Module):
    """reference: models/net.py:142-165 (+SE variant :198-201)."""

    in_channel: int
    depth: int
    stride: int
    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype)
        if self.in_channel == self.depth:
            shortcut = _max_pool_stride(x, self.stride)
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="shortcut_conv")(x)
            shortcut = bn(name="shortcut_bn")(shortcut)
        res = bn(name="res_bn1")(x)
        res = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="res_conv1")(res)
        res = bn(name="res_bn2")(res)
        res = PReLU(self.depth, name="res_prelu")(res)
        res = nn.Conv(self.depth, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="res_conv2")(res)
        res = bn(name="res_bn3")(res)
        if self.use_se:
            res = SEModule(self.depth, dtype=self.dtype, name="se")(res)
        return res + shortcut


class BottleneckIR(nn.Module):
    """reference: models/net.py:168-195 (+SE variant :204-207)."""

    in_channel: int
    depth: int
    stride: int
    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype)
        red = self.depth // 4
        if self.in_channel == self.depth:
            shortcut = _max_pool_stride(x, self.stride)
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="shortcut_conv")(x)
            shortcut = bn(name="shortcut_bn")(shortcut)
        res = bn(name="res_bn1")(x)
        res = nn.Conv(red, (1, 1), use_bias=False, dtype=self.dtype,
                      name="res_conv1")(res)
        res = bn(name="res_bn2")(res)
        res = PReLU(red, name="res_prelu1")(res)
        res = nn.Conv(red, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                      name="res_conv2")(res)
        res = bn(name="res_bn3")(res)
        res = PReLU(red, name="res_prelu2")(res)
        res = nn.Conv(self.depth, (1, 1), strides=self.stride, use_bias=False,
                      dtype=self.dtype, name="res_conv3")(res)
        res = bn(name="res_bn4")(res)
        if self.use_se:
            res = SEModule(self.depth, dtype=self.dtype, name="se")(res)
        return res + shortcut


class IRBackbone(nn.Module):
    """AdaFace backbone with (global, local, norm) outputs
    (reference: models/net.py:267-333). local map taken at body index 5 — for
    ir_18 that is the end of the 256-channel stage, a (B, 14, 14, 256) map.
    """

    num_layers: int = 18
    mode: str = "ir"  # "ir" | "ir_se"
    dropout: float = 0.4
    dtype: Dtype = jnp.float32
    local_index: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        assert self.num_layers in _BLOCK_SPECS
        use_se = self.mode == "ir_se"
        bottleneck = self.num_layers > 100
        block_cls = BottleneckIR if bottleneck else BasicBlockIR

        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="input_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="input_bn")(x)
        x = PReLU(64, name="input_prelu")(x)

        local_feat = None
        idx = 0
        in_channel = 64
        for depth, num_units in _BLOCK_SPECS[self.num_layers]:
            for u in range(num_units):
                stride = 2 if u == 0 else 1
                x = block_cls(in_channel, depth, stride, use_se, self.dtype,
                              name=f"body_{idx}")(x, train)
                in_channel = depth
                if idx == self.local_index:
                    local_feat = x
                idx += 1

        # output layer: BN -> Dropout -> Flatten -> Linear -> BN1d(affine-free)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="output_bn")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, dtype=jnp.float32, name="output_fc")(
            x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                         use_bias=False, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="output_features")(x)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        global_feat = x / jnp.maximum(norm, 1e-12)
        return global_feat, local_feat, norm


def build_model(model_name: str = "ir_50", dtype: Dtype = jnp.float32) -> IRBackbone:
    """reference: models/net.py:14-26."""
    table = {
        "ir_18": (18, "ir"), "ir_34": (34, "ir"), "ir_50": (50, "ir"),
        "ir_101": (100, "ir"), "ir_152": (152, "ir"), "ir_200": (200, "ir"),
        "ir_se_50": (50, "ir_se"), "ir_se_101": (100, "ir_se"),
        "ir_se_152": (152, "ir_se"), "ir_se_200": (200, "ir_se"),
    }
    if model_name not in table:
        raise ValueError(f"not a correct model name: {model_name}")
    num_layers, mode = table[model_name]
    return IRBackbone(num_layers=num_layers, mode=mode, dtype=dtype)
