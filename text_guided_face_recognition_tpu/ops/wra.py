"""Word-Region Alignment (WRA) loss — attention-weighted word InfoNCE.

Behavioral port of the reference's WordRegionAlignment module (reference:
models/losses.py:355-425; its patch-direction half is a commented-out block
:426-483 and is not implemented). In the reference pipeline the `is_WRA` flag
is a no-op `pass` (src/train_encoders_bert.py:286-287), so this is capability
surface: a usable, jit-clean functional implementation.

Differences from the torch sketch (documented):
  * the reference's optional `use_local_atten` MultiheadAttention branch is
    constructed but disabled (`use_local_atten = False`); only the live
    dot-product attention path is implemented
  * the 10/90-percentile clipping of attention weights runs over each row's
    *valid* (mask-selected) entries instead of `nonzero()` indices — identical
    for the reference's inputs (attention over softmax outputs is positive),
    and shape-static under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["word_region_alignment_loss"]


def _masked_percentile(x: jnp.ndarray, mask: jnp.ndarray, q: float
                       ) -> jnp.ndarray:
    """Per-row percentile over masked entries (linear interpolation, matching
    torch.quantile). x, mask: (B, N); returns (B, 1)."""
    big = jnp.finfo(x.dtype).max
    n_valid = jnp.sum(mask, axis=-1)                       # (B,)
    xs = jnp.sort(jnp.where(mask > 0, x, big), axis=-1)    # valid first
    pos = (q / 100.0) * (n_valid - 1.0)
    lo = jnp.clip(jnp.floor(pos), 0, x.shape[-1] - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, x.shape[-1] - 1)
    frac = (pos - lo.astype(pos.dtype))[:, None]
    vlo = jnp.take_along_axis(xs, lo[:, None], axis=-1)
    vhi = jnp.take_along_axis(xs, hi[:, None], axis=-1)
    vhi = jnp.where(hi[:, None] > (n_valid[:, None] - 1).astype(jnp.int32),
                    vlo, vhi)
    return vlo + frac * (vhi - vlo)


def word_region_alignment_loss(
    word_emb: jnp.ndarray,        # (B, N_w, D)
    region_emb: jnp.ndarray,      # (B, N_r, D)
    word_attn: jnp.ndarray,       # (B, N_w) external attention weights
    word_mask: Optional[jnp.ndarray] = None,  # (B, N_w)
    local_temperature: float = 0.1,
) -> jnp.ndarray:
    """Bidirectional word<->attended-region InfoNCE weighted by clipped
    attention weights (reference math: models/losses.py:381-424)."""
    b, n_w, _ = word_emb.shape
    we = word_emb.astype(jnp.float32)
    re = region_emb.astype(jnp.float32)

    atten_sim = jnp.einsum("bwd,brd->bwr", we, re)
    atten_scores = jax.nn.softmax(atten_sim / local_temperature, axis=-1)
    word_atten_output = jnp.einsum("bwr,brd->bwd", atten_scores, re)
    word_atten_output = word_atten_output / jnp.maximum(
        jnp.linalg.norm(word_atten_output, axis=-1, keepdims=True), 1e-12)

    # clip attention weights to their row 10/90 percentiles, then normalize
    aw = jax.lax.stop_gradient(word_attn.astype(jnp.float32))
    mask = (jnp.ones_like(aw) if word_mask is None
            else word_mask.astype(jnp.float32))
    lo = _masked_percentile(aw, mask, 10.0)
    hi = _masked_percentile(aw, mask, 90.0)
    aw = jnp.where(mask > 0, jnp.clip(aw, lo, hi), 0.0)
    aw = aw / jnp.maximum(jnp.sum(aw, axis=1, keepdims=True), 1e-12)

    word_sim = jnp.einsum("bwd,bvd->bwv", we, word_atten_output)
    word_sim = word_sim / local_temperature                 # (B, Nw, Nw)
    targets = jnp.tile(jnp.arange(n_w), b)
    w_flat = aw.reshape(-1)

    def weighted_ce(sim2d):
        logp = jax.nn.log_softmax(sim2d, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        return jnp.sum(nll * w_flat) / b

    loss1 = weighted_ce(word_sim.reshape(b * n_w, n_w))
    loss2 = weighted_ce(jnp.swapaxes(word_sim, 1, 2).reshape(b * n_w, n_w))
    return (loss1 + loss2) / 2.0
