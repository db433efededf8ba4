"""MagFace model surface (reference: models/magface.py, models/network.py).

The inference path used by the pipeline is just an iResNet returning
(global, local) — the reference's `NetworkBuilder` (models/network.py:27-35)
wraps `iresnet.*` unchanged, so here `network_builder` returns the same flax
IResNet used for ArcFace; the MagFace-specific pieces are the trainable
`MagLinear` head (see models/margins.py) and `mag_loss`
(reference: models/magface.py:111-136).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from text_guided_face_recognition_tpu.models import iresnet
from text_guided_face_recognition_tpu.ops.losses import cross_entropy_rows
from text_guided_face_recognition_tpu.ops.margins import mag_loss_g

__all__ = ["network_builder", "SoftmaxBuilder", "mag_loss"]

_ARCHS = {
    "iresnet18": iresnet.iresnet18,
    "iresnet34": iresnet.iresnet34,
    "iresnet50": iresnet.iresnet50,
    "iresnet100": iresnet.iresnet100,
    "iresnet200": iresnet.iresnet200,
}


def network_builder(arch: str = "iresnet18", **kw) -> iresnet.IResNet:
    """reference: models/network.py:14-35 — MagFace backbone = iresnet
    forwarding (global feature, local map)."""
    return _ARCHS[arch](**kw)


class SoftmaxBuilder(nn.Module):
    """Trainable MagFace model: iResNet features + MagLinear head
    (reference: models/magface.py:43-66). Returns (logit pair, x_norm) for
    mag_loss; the margin is linear in the feature norm."""

    arch: str = "iresnet18"
    embedding_size: int = 512
    last_fc_size: int = 1000
    arc_scale: float = 64.0
    l_margin: float = 0.45
    u_margin: float = 0.8
    l_a: float = 10.0
    u_a: float = 110.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        from text_guided_face_recognition_tpu.models.margins import MagLinear
        feats, _local = _ARCHS[self.arch](
            num_features=self.embedding_size, name="features")(x, train=train)
        logits_pair, x_norm = MagLinear(
            self.embedding_size, self.last_fc_size, scale=self.arc_scale,
            l_margin=self.l_margin, u_margin=self.u_margin, l_a=self.l_a,
            u_a=self.u_a, name="fc")(feats)
        return logits_pair, x_norm


def mag_loss(
    logits_pair: Tuple[jnp.ndarray, jnp.ndarray],
    target: jnp.ndarray,
    x_norm: jnp.ndarray,
    u_a: float = 110.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MagFace loss (reference: models/magface.py:111-136): CE on the
    margin-substituted logits + the magnitude regularizer g."""
    cos_theta, cos_theta_m = logits_pair
    one_hot = jax.nn.one_hot(target, cos_theta.shape[1], dtype=cos_theta.dtype)
    output = one_hot * cos_theta_m + (1.0 - one_hot) * cos_theta
    loss = cross_entropy_rows(output, target)
    loss_g = mag_loss_g(x_norm, u_a)
    return loss, loss_g
