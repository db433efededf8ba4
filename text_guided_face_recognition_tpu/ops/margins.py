"""Angular-margin classifier math (ArcFace / CosFace / SphereFace / AdaFace /
MagFace) as pure fp32 functions.

Behavioral ports of reference models/metrics.py:17-247 and models/magface.py:69-136
with TPU-clean semantics: one-hot via jax.nn.one_hot (the reference scatters on a
hard-coded 'cuda' device, models/metrics.py:53), no in-place buffer mutation
(AdaFace's EMA batch stats are explicit state in/out), and all trig/margin math
kept in float32 regardless of the network compute dtype (SURVEY.md §7 hard part 7).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "normalized_cosine",
    "arc_margin_logits",
    "add_margin_logits",
    "sphere_margin_logits",
    "adaface_logits",
    "mag_margin_logits",
    "mag_loss_g",
]


def normalized_cosine(embeddings: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """cos(theta) between l2-normalized embeddings and class weights.

    weight layout: (out_features, in_features), torch F.linear convention
    (reference: models/metrics.py:44)."""
    e = embeddings.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
    return e @ w.T


def arc_margin_logits(
    embeddings: jnp.ndarray,
    weight: jnp.ndarray,
    label: jnp.ndarray,
    s: float = 30.0,
    m: float = 0.50,
    easy_margin: bool = False,
) -> jnp.ndarray:
    """ArcFace cos(theta + m) logits (reference: models/metrics.py:17-60)."""
    cosine = normalized_cosine(embeddings, weight)
    # Floor 1-cos^2 at 1e-12, not 0: sqrt'(0) is inf, and when a target
    # cosine reaches +-1 (fp round-off past 1 clips to exactly 0) the
    # backward emits 0*inf = NaN that poisons every param group in one
    # step — observed live at B=64 (probe: all-groups NaN at step 94; the
    # torch reference's sqrt((1-cos^2).clamp(0,1)) has the same latent
    # cliff, it just never trips at B=32 horizons). Forward delta <=1e-6.
    sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(cosine), 1e-12, 1.0))
    cos_m, sin_m = math.cos(m), math.sin(m)
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = jnp.where(cosine > th, phi, cosine - mm)
    one_hot = jax.nn.one_hot(label, cosine.shape[1], dtype=cosine.dtype)
    return (one_hot * phi + (1.0 - one_hot) * cosine) * s


def add_margin_logits(
    embeddings: jnp.ndarray,
    weight: jnp.ndarray,
    label: jnp.ndarray,
    s: float = 30.0,
    m: float = 0.40,
) -> jnp.ndarray:
    """CosFace cos(theta) - m logits (reference: models/metrics.py:63-102)."""
    cosine = normalized_cosine(embeddings, weight)
    phi = cosine - m
    one_hot = jax.nn.one_hot(label, cosine.shape[1], dtype=cosine.dtype)
    return (one_hot * phi + (1.0 - one_hot) * cosine) * s


_SPHERE_MLAMBDA = [
    lambda x: x * 0 + 1.0,
    lambda x: x,
    lambda x: 2 * x**2 - 1,
    lambda x: 4 * x**3 - 3 * x,
    lambda x: 8 * x**4 - 8 * x**2 + 1,
    lambda x: 16 * x**5 - 20 * x**3 + 5 * x,
]


def sphere_margin_logits(
    embeddings: jnp.ndarray,
    weight: jnp.ndarray,
    label: jnp.ndarray,
    iteration: jnp.ndarray | int,
    m: int = 4,
    base: float = 1000.0,
    gamma: float = 0.12,
    power: float = 1.0,
    lambda_min: float = 5.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SphereFace cos(m*theta) with annealing lambda
    (reference: models/metrics.py:105-165). The reference mutates a step
    counter on the module; here the counter is explicit — pass `iteration`,
    get back (logits, iteration+1)."""
    it = jnp.asarray(iteration, jnp.float32) + 1.0
    lamb = jnp.maximum(lambda_min, base * (1 + gamma * it) ** (-power))
    cos_theta = jnp.clip(normalized_cosine(embeddings, weight), -1.0, 1.0)
    cos_m_theta = _SPHERE_MLAMBDA[m](cos_theta)
    # arccos'(+-1) is infinite — same 0*inf NaN cliff as arc_margin's
    # sqrt (see above); keep the arccos argument strictly inside (-1, 1).
    # theta shift at the clamp is ~4.5e-4 rad, k=floor(m*theta/pi) unchanged.
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7))
    k = jnp.floor(m * theta / math.pi)
    phi_theta = ((-1.0) ** k) * cos_m_theta - 2 * k
    norm_of_feature = jnp.linalg.norm(embeddings.astype(jnp.float32), axis=1)
    one_hot = jax.nn.one_hot(label, cos_theta.shape[1], dtype=cos_theta.dtype)
    logits = (one_hot * (phi_theta - cos_theta) / (1 + lamb)) + cos_theta
    logits = logits * norm_of_feature[:, None]
    return logits, it


def adaface_logits(
    embeddings: jnp.ndarray,
    kernel: jnp.ndarray,
    norms: jnp.ndarray,
    label: jnp.ndarray,
    batch_mean: jnp.ndarray,
    batch_std: jnp.ndarray,
    m: float = 0.4,
    h: float = 0.333,
    s: float = 64.0,
    t_alpha: float = 1.0,
    eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AdaFace norm-adaptive margin (reference: models/metrics.py:170-247).

    kernel layout: (embedding_size, classnum) — the reference's orientation.
    EMA buffers are explicit: returns (logits, new_batch_mean, new_batch_std).
    """
    e = embeddings.astype(jnp.float32)
    k = kernel.astype(jnp.float32)
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=0, keepdims=True), 1e-12)
    cosine = jnp.clip(e @ kn, -1 + eps, 1 - eps)

    safe_norms = jax.lax.stop_gradient(jnp.clip(norms.astype(jnp.float32), 0.001, 100))
    mean = jnp.mean(safe_norms)
    std = jnp.std(safe_norms, ddof=1)
    new_mean = mean * t_alpha + (1 - t_alpha) * batch_mean
    new_std = std * t_alpha + (1 - t_alpha) * batch_std

    margin_scaler = (safe_norms - new_mean) / (new_std + eps)
    margin_scaler = jnp.clip(margin_scaler * h, -1.0, 1.0).reshape(-1, 1)

    one_hot = jax.nn.one_hot(label, cosine.shape[1], dtype=cosine.dtype)
    # g_angular
    g_angular = m * margin_scaler * -1.0
    theta = jnp.arccos(cosine)
    theta_m = jnp.clip(theta + one_hot * g_angular, eps, math.pi - eps)
    cosine2 = jnp.cos(theta_m)
    # g_additive
    g_add = m + (m * margin_scaler)
    cosine3 = cosine2 - one_hot * g_add
    return cosine3 * s, new_mean, new_std


def mag_margin_logits(
    embeddings: jnp.ndarray,
    weight: jnp.ndarray,
    margin_fn: Callable[[jnp.ndarray], jnp.ndarray],
    l_a: float = 10.0,
    u_a: float = 110.0,
    scale: float = 64.0,
    easy_margin: bool = True,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """MagFace magnitude-aware margin (reference: models/magface.py:69-108).

    weight layout: (in_features, out_features). Returns
    ([scaled cos_theta, scaled cos(theta+m(|x|))], x_norm).
    """
    x = embeddings.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    x_norm = jnp.clip(jnp.linalg.norm(x, axis=1, keepdims=True), l_a, u_a)
    ada_margin = margin_fn(x_norm)
    cos_m, sin_m = jnp.cos(ada_margin), jnp.sin(ada_margin)
    wn = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cos_theta = jnp.clip(xn @ wn, -1.0, 1.0)
    # 1e-12 floor: sqrt'(0)=inf => 0*inf NaN in backward when a target
    # cosine saturates at +-1 (see arc_margin_logits above).
    sin_theta = jnp.sqrt(jnp.clip(1.0 - jnp.square(cos_theta), 1e-12, None))
    cos_theta_m = cos_theta * cos_m - sin_theta * sin_m
    if easy_margin:
        cos_theta_m = jnp.where(cos_theta > 0, cos_theta_m, cos_theta)
    else:
        mm = jnp.sin(math.pi - ada_margin) * ada_margin
        threshold = jnp.cos(math.pi - ada_margin)
        cos_theta_m = jnp.where(cos_theta > threshold, cos_theta_m, cos_theta - mm)
    return (scale * cos_theta, scale * cos_theta_m), x_norm


def mag_loss_g(x_norm: jnp.ndarray, u_a: float = 110.0) -> jnp.ndarray:
    """MagFace magnitude regularizer g (reference: models/magface.py:124-126)."""
    g = (1.0 / u_a**2) * x_norm + 1.0 / x_norm
    return jnp.mean(g)


def linear_margin_fn(l_margin: float, u_margin: float, l_a: float, u_a: float):
    """Adaptive margin linear in the feature norm
    (reference: models/magface.py:56-61)."""
    def fn(x):
        return (u_margin - l_margin) / (u_a - l_a) * (x - l_a) + l_margin
    return fn
