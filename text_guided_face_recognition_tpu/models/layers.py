"""Shared flax building blocks.

All spatial modules use NHWC layout — the TPU-native convention (XLA tiles the
channel dim onto the 128-lane axis). The reference uses torch NCHW; weight
converters in engine/convert.py handle the transpose. Docstrings cite the
reference modules they are behaviorally equivalent to.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """l2 normalization (reference: models/models.py:18-21 `l2_norm`)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch nn.PReLU(num_parameters=C)).

    flax's builtin PReLU is single-parameter; face backbones need the
    per-channel variant (reference: models/iresnet.py:41, models/net.py:157).
    Parameter kept fp32; computation follows input dtype.
    """

    features: int
    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda k: jnp.full((self.features,), self.init_alpha, jnp.float32)
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class ProjectionHead(nn.Module):
    """Linear projection + l2 norm (reference: models/models.py:98-120 — the
    GELU/fc/dropout/LayerNorm stack is present-but-commented in the reference;
    only Linear + normalize is live)."""

    projection_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.projection_dim, dtype=self.dtype, name="projection")(x)
        return l2_normalize(x, axis=-1)


class LayerNormCHW(nn.Module):
    """LayerNorm over the full (H, W, C) feature block with elementwise affine,
    equivalent to torch nn.LayerNorm([C, H, W]) on NCHW tensors
    (reference: models/models.py:391, models/fusion_nets.py:229-231,270-271).

    Input is NHWC; the affine parameters have shape (H, W, C).
    """

    feature_shape: Sequence[int]  # (H, W, C)
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = tuple(self.feature_shape)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * scale + bias).astype(x.dtype)


class SelfAttention2D(nn.Module):
    """Conv-projected 2-D cross-attention (reference: models/fusion_nets.py:82-118).

    q is projected from `y`, k/v from `x`; attention is (HW x HW) with divisor
    sqrt(C/scale). NHWC in, NHWC out. The three 1x1 convs become Dense layers
    over the channel axis (identical math, better XLA fusion).
    """

    channel_dim: int
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        c_proj = self.channel_dim // self.scale
        q = nn.Dense(c_proj, dtype=self.dtype, name="query_proj")(y)   # (B,H,W,C')
        k = nn.Dense(c_proj, dtype=self.dtype, name="key_proj")(x)
        v = nn.Dense(self.channel_dim, dtype=self.dtype, name="value_proj")(x)

        b, h, w, _ = q.shape
        hw = h * w
        q2 = q.reshape(b, hw, c_proj)
        k2 = k.reshape(b, hw, c_proj)
        v2 = v.reshape(b, hw, self.channel_dim)

        # reference: attention[n, i, j] = <key_i, query_j> / sqrt(C/scale),
        # softmax over j, response_i = sum_j attention[i, j] * value_j
        attn = jnp.einsum("bic,bjc->bij", k2, q2,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(jnp.float32(self.channel_dim / self.scale))
        attn = nn.softmax(attn, axis=-1).astype(v2.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v2,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        # (reference views the flat (N, C, HW) buffer as (N, C, W, H); for the
        # square maps used everywhere this is identical to (N, C, H, W))
        return out.reshape(b, h, w, self.channel_dim)


class ScaledDotProductAttention(nn.Module):
    """Plain scaled dot-product attention over sequences
    (reference: models/fusion_nets.py:16-47)."""

    dim: int

    @nn.compact
    def __call__(self, query, key, value, mask=None):
        score = jnp.einsum("bqd,bkd->bqk", query, key) / jnp.sqrt(jnp.float32(self.dim))
        if mask is not None:
            score = jnp.where(mask, -jnp.inf, score)
        attn = nn.softmax(score.astype(jnp.float32), axis=-1).astype(value.dtype)
        context = jnp.einsum("bqk,bkd->bqd", attn, value)
        return context, attn


class DotProductAttention(nn.Module):
    """Unscaled dot-product attention (reference: models/fusion_nets.py:50-64;
    unused by entry points, capability surface)."""

    @nn.compact
    def __call__(self, query, value):
        score = jnp.einsum("bqd,bkd->bqk", query, value)
        attn = nn.softmax(score.astype(jnp.float32), axis=-1).astype(value.dtype)
        context = jnp.einsum("bqk,bkd->bqd", attn, value)
        return context, attn


class MultiHeadAttention(nn.Module):
    """Multi-head attention helper (reference: models/fusion_nets.py:122-159)."""

    d_model: int = 32
    num_heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, mask=None):
        assert self.d_model % self.num_heads == 0
        d_head = self.d_model // self.num_heads
        b = value.shape[0]

        def split(x, name):
            x = nn.Dense(self.d_model, dtype=self.dtype, name=name)(x)
            return x.reshape(b, -1, self.num_heads, d_head).transpose(0, 2, 1, 3)

        q = split(query, "query_proj")
        k = split(key, "key_proj")
        v = split(value, "value_proj")
        score = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d_head))
        if mask is not None:
            score = jnp.where(mask[:, None], -jnp.inf, score)
        attn = nn.softmax(score.astype(jnp.float32), axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return ctx.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)


class TorchMultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-equivalent (joint in-proj + out-proj),
    used by ParagraphLevelCFA / ConcatAttention (reference:
    models/fusion_nets.py:299, :318)."""

    embed_dim: int
    num_heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value):
        d_head = self.embed_dim // self.num_heads
        b = query.shape[0]
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(value)

        def heads(x):
            return x.reshape(b, -1, self.num_heads, d_head).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        score = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(jnp.float32(d_head))
        attn = nn.softmax(score.astype(jnp.float32), axis=-1).astype(vh.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, -1, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(ctx)
