"""Word <-> region attention (DAMSM / AttnGAN style), vectorized for the MXU.

The reference computes word-region attention one caption at a time inside a
Python loop over the batch (reference: models/losses.py:73-111 calling
models/attention.py:10-43) — a B x [bmm(196,T) chain] per step. Here the whole
B_caption x B_image similarity tensor is produced by two large matmuls shaped
for the TPU MXU:

  1. logits:   (B*T, D) @ (D, B*R)   — one big GEMM over the feature dim
  2. weighted: per-image batched GEMM (B, T*B, R) @ (B, R, D)

with the double-softmax (over words, then gamma1-scaled over regions) and the
gamma2-smoothed log-sum-exp fused in between by XLA. Variable caption lengths
are handled with masks instead of the reference's per-sample truncation
(semantics identical: masked words get -inf attention logits and are excluded
from the final LSE).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["func_attention", "damsm_similarity"]


def func_attention(
    query: jnp.ndarray,
    context: jnp.ndarray,
    gamma1: float,
    query_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched AttnGAN attention (reference: models/attention.py:10-43).

    Args:
      query:   (B, D, T)  word features
      context: (B, D, H, W) region features
      gamma1:  attention smoothing temperature
      query_mask: optional (B, T) bool, True for valid words

    Returns:
      weighted_context: (B, D, T)
      attn: (B, T, H, W) region attention per word
    """
    b, d, t = query.shape
    h, w = context.shape[2], context.shape[3]
    ctx = context.reshape(b, d, h * w)  # (B, D, R)

    # attn[b, r, t] = <ctx[b,:,r], query[b,:,t]>
    attn = jnp.einsum("bdr,bdt->brt", ctx, query)
    if query_mask is not None:
        attn = jnp.where(query_mask[:, None, :], attn, -jnp.inf)
    # softmax over words (reference softmaxes dim=-1 on (B*R, T))
    attn = jax.nn.softmax(attn, axis=-1)
    # gamma1-scaled softmax over regions
    attn = jnp.swapaxes(attn, 1, 2)  # (B, T, R)
    attn = jax.nn.softmax(attn * gamma1, axis=-1)
    weighted = jnp.einsum("bdr,btr->bdt", ctx, attn)
    return weighted, attn.reshape(b, t, h, w)


def damsm_similarity(
    words: jnp.ndarray,
    regions: jnp.ndarray,
    gamma1: float,
    gamma2: float,
    word_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Full caption-image DAMSM similarity matrix, fully vectorized.

    Replaces the reference's per-caption loop (models/losses.py:73-111): for
    every (caption i, image j) pair, attend caption i's words over image j's
    regions, take per-word cosine between the word and its attended region
    summary, and gamma2-smooth-LSE over words.

    Args:
      words:   (B, D, T)  l2-space word features (captions)
      regions: (B, D, R)  region features (images; R = H*W, e.g. 196)
      gamma1, gamma2: DAMSM smoothing temperatures
      word_mask: optional (B, T) bool, True where word t is valid for caption i
                 (LSTM path: t < cap_len; BERT path: all True on the fixed 22)

    Returns:
      sim: (B, B) with sim[j, i] = smoothed match of caption i against image j
           (row = image, column = caption — the reference's layout, see
           models/losses.py:111-114 where each caption appends a column).
    """
    b, d, t = words.shape
    r = regions.shape[2]

    # Stage 1: all caption-word x all image-region logits in one GEMM:
    # (B*T, D) @ (D, B*R) -> (B*T, B*R), ideal MXU shape.
    wq = jnp.swapaxes(words, 1, 2).reshape(b * t, d)          # (i*t, d)
    ck = regions.reshape(b, d, r)                              # (j, d, r)
    logits = jnp.einsum(
        "qd,jdr->qjr", wq, ck, preferred_element_type=jnp.float32
    ).reshape(b, t, b, r)                                      # [i, t, j, r]

    # softmax over words t (per caption i, image j, region r) — masked words out
    lw = jnp.swapaxes(logits, 1, 3)                            # [i, r, j, t]
    if word_mask is not None:
        lw = jnp.where(word_mask[:, None, None, :], lw, -jnp.inf)
    aw = jax.nn.softmax(lw, axis=-1)
    # gamma1-scaled softmax over regions r (per caption i, image j, word t)
    ar = jax.nn.softmax(jnp.swapaxes(aw, 1, 3) * gamma1, axis=-1)  # [i, t, j, r]

    # Stage 2: attended region summary per (i, t, j):
    # batched over images j: (j, i*t, r) @ (j, r, d) -> (j, i*t, d)
    arj = jnp.transpose(ar, (2, 0, 1, 3)).reshape(b, b * t, r)  # (j, i*t, r)
    ctxT = jnp.swapaxes(ck, 1, 2)                               # (j, r, d)
    wctx = jnp.matmul(arj, ctxT, preferred_element_type=jnp.float32)
    wctx = wctx.reshape(b, b, t, d)                             # [j, i, t, d]

    # per-word cosine between word (i, t) and its attended summary (j, i, t)
    wv = jnp.swapaxes(words, 1, 2)                              # [i, t, d]
    dots = jnp.einsum("itd,jitd->jit", wv, wctx)
    wn = jnp.linalg.norm(wv, axis=-1)                           # [i, t]
    cn = jnp.linalg.norm(wctx, axis=-1)                         # [j, i, t]
    cos = dots / jnp.maximum(wn[None] * cn, eps)                # [j, i, t]

    # gamma2-smoothed LSE over valid words (reference: mul.exp.sum.log chain)
    z = cos * gamma2
    if word_mask is not None:
        z = jnp.where(word_mask[None, :, :], z, -jnp.inf)
    return jax.nn.logsumexp(z, axis=-1)                         # [j, i]
