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

from text_guided_face_recognition_tpu.models import iresnet
from text_guided_face_recognition_tpu.ops.losses import cross_entropy_rows
from text_guided_face_recognition_tpu.ops.margins import mag_loss_g

__all__ = ["network_builder", "mag_loss"]

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
