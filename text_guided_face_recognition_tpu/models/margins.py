"""Margin classifier heads as flax modules.

Thin parameter-owning wrappers over the pure fp32 math in ops/margins.py.
Behavioral equivalents of reference models/metrics.py (ArcMarginProduct /
AddMarginProduct / SphereProduct / AdaFace) and models/magface.py (MagLinear).
AdaFace's EMA buffers and SphereProduct's step counter live in a flax
"margin_stats" variable collection instead of mutable module attributes.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from text_guided_face_recognition_tpu.ops import margins as M

Dtype = Any

__all__ = ["ArcMarginProduct", "AddMarginProduct", "SphereProduct",
           "AdaFaceHead", "MagLinear"]


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


class ArcMarginProduct(nn.Module):
    """reference: models/metrics.py:17-60 (s=30/m=0.5 image & fusion heads,
    s=35/m=0.5 text head: src/train_encoders_bert.py:140-166)."""

    in_features: int
    out_features: int
    s: float = 30.0
    m: float = 0.50
    easy_margin: bool = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", _xavier_uniform(),
                            (self.out_features, self.in_features), jnp.float32)
        return M.arc_margin_logits(inputs, weight, label, self.s, self.m,
                                   self.easy_margin)


class AddMarginProduct(nn.Module):
    """CosFace head (reference: models/metrics.py:63-102)."""

    in_features: int
    out_features: int
    s: float = 30.0
    m: float = 0.40

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", _xavier_uniform(),
                            (self.out_features, self.in_features), jnp.float32)
        return M.add_margin_logits(inputs, weight, label, self.s, self.m)


class SphereProduct(nn.Module):
    """SphereFace head with annealing lambda (reference: models/metrics.py:105-165).
    The iteration counter is a mutable 'margin_stats' variable."""

    in_features: int
    out_features: int
    m: int = 4

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", _xavier_uniform(),
                            (self.out_features, self.in_features), jnp.float32)
        it = self.variable("margin_stats", "iter",
                           lambda: jnp.zeros((), jnp.float32))
        logits, new_it = M.sphere_margin_logits(inputs, weight, label,
                                                it.value, self.m)
        if not self.is_initializing():
            it.value = new_it
        return logits


class AdaFaceHead(nn.Module):
    """AdaFace norm-adaptive margin head (reference: models/metrics.py:170-247).
    EMA batch-mean/std buffers live in 'margin_stats'."""

    embedding_size: int
    classnum: int
    m: float = 0.4
    h: float = 0.333
    s: float = 64.0
    t_alpha: float = 1.0

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, norms: jnp.ndarray,
                 label: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            lambda k: nn.initializers.uniform(scale=2.0)(
                k, (self.embedding_size, self.classnum), jnp.float32) - 1.0,
            )
        mean = self.variable("margin_stats", "batch_mean",
                             lambda: jnp.asarray(20.0, jnp.float32))
        std = self.variable("margin_stats", "batch_std",
                            lambda: jnp.asarray(100.0, jnp.float32))
        logits, new_mean, new_std = M.adaface_logits(
            embeddings, kernel, norms, label, mean.value, std.value,
            self.m, self.h, self.s, self.t_alpha)
        if not self.is_initializing():
            mean.value = new_mean
            std.value = new_std
        return logits


class MagLinear(nn.Module):
    """MagFace magnitude-aware margin head (reference: models/magface.py:69-108).
    Returns ([scaled cos, scaled cos(theta+m(|x|))], x_norm)."""

    in_features: int
    out_features: int
    scale: float = 64.0
    easy_margin: bool = True
    l_margin: float = 0.45
    u_margin: float = 0.8
    l_a: float = 10.0
    u_a: float = 110.0

    @nn.compact
    def __call__(self, inputs: jnp.ndarray):
        weight = self.param(
            "weight",
            lambda k: nn.initializers.uniform(scale=2.0)(
                k, (self.in_features, self.out_features), jnp.float32) - 1.0,
        )
        margin_fn = M.linear_margin_fn(self.l_margin, self.u_margin,
                                       self.l_a, self.u_a)
        return M.mag_margin_logits(inputs, weight, margin_fn, self.l_a,
                                   self.u_a, self.scale, self.easy_margin)
