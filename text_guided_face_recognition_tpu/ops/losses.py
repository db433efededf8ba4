"""FCAM multi-granularity contrastive losses + identity losses.

Behavioral ports of the reference loss cocktail (reference: models/losses.py)
as pure jnp functions — no Python batch loops, no device pinning, batch-global
semantics preserved (the reference computes every B x B matrix on the gathered
full batch under nn.DataParallel; under pjit/shard_map the same is achieved
with sharding annotations or an explicit all_gather — see parallel/).

All losses return fp32 scalars; upstream activations may be bf16.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu.ops.attention import damsm_similarity

__all__ = [
    "cosine_similarity",
    "cross_entropy_rows",
    "sent_loss",
    "words_loss",
    "global_loss",
    "clip_loss",
    "clip_soft_loss",
    "cmpc_loss",
    "cmpm_loss",
    "focal_loss",
    "kl_loss",
]


def cosine_similarity(x1: jnp.ndarray, x2: jnp.ndarray, axis: int = 1,
                      eps: float = 1e-8) -> jnp.ndarray:
    """Row-wise cosine (reference: models/losses.py:12-16)."""
    w12 = jnp.sum(x1 * x2, axis=axis)
    w1 = jnp.linalg.norm(x1, axis=axis)
    w2 = jnp.linalg.norm(x2, axis=axis)
    return w12 / jnp.maximum(w1 * w2, eps)


def cross_entropy_rows(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy over rows (torch nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def _class_mask(class_ids: jnp.ndarray) -> jnp.ndarray:
    """mask[i, j] True where i and j share a class but i != j
    (reference: models/losses.py:21-28)."""
    same = class_ids[:, None] == class_ids[None, :]
    return same & ~jnp.eye(class_ids.shape[0], dtype=bool)


def sent_loss(
    cnn_code: jnp.ndarray,
    rnn_code: jnp.ndarray,
    labels: jnp.ndarray,
    class_ids: Optional[jnp.ndarray],
    gamma3: float = 10.0,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DAMSM sentence loss (reference: models/losses.py:19-57).

    B x B cosine score matrix scaled by gamma3; same-class off-diagonal pairs
    masked to -inf; symmetric CE against diagonal labels.
    """
    cnn = cnn_code.astype(jnp.float32)
    rnn = rnn_code.astype(jnp.float32)
    scores = cnn @ rnn.T
    norms = jnp.linalg.norm(cnn, axis=1, keepdims=True) * \
        jnp.linalg.norm(rnn, axis=1, keepdims=True).T
    scores = scores / jnp.maximum(norms, eps) * gamma3
    if class_ids is not None:
        scores = jnp.where(_class_mask(class_ids), -jnp.inf, scores)
    loss0 = cross_entropy_rows(scores, labels)
    loss1 = cross_entropy_rows(scores.T, labels)
    return loss0, loss1


def words_loss(
    img_features: jnp.ndarray,
    words_emb: jnp.ndarray,
    labels: jnp.ndarray,
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    gamma3: float = 10.0,
    word_mask: Optional[jnp.ndarray] = None,
    return_attn: bool = False,
    use_pallas: bool = False,
):
    """DAMSM word loss, vectorized (reference: models/losses.py:61-135).

    Args:
      img_features: (B, D, H, W) local region map (the 14x14 grid)
      words_emb:    (B, D, T) word features
      labels:       (B,) diagonal labels (arange)
      word_mask:    (B, T) validity mask. LSTM: t < cap_len (the reference
                    truncates each caption to its length); BERT: first
                    bert_words_num-2 positions valid (models/losses.py:83).
      return_attn:  also return per-pair attention maps for caption i on its
                    own image (B, T, H, W), as the reference does.

    Returns (loss0, loss1[, attn]) — CE over images-per-caption and
    captions-per-image on the gamma3-scaled similarity matrix.
    """
    b, d, h, w = img_features.shape
    regions = img_features.reshape(b, d, h * w).astype(jnp.float32)
    words = words_emb.astype(jnp.float32)
    if use_pallas:
        from text_guided_face_recognition_tpu.ops.damsm_pallas import (
            damsm_similarity_fused)
        sim = damsm_similarity_fused(words, regions, gamma1, gamma2, word_mask)
    else:
        sim = damsm_similarity(words, regions, gamma1, gamma2, word_mask)  # [img j, cap i]
    sim = sim * gamma3
    loss0 = cross_entropy_rows(sim, labels)      # per image: pick its caption
    loss1 = cross_entropy_rows(sim.T, labels)    # per caption: pick its image
    if not return_attn:
        return loss0, loss1
    from text_guided_face_recognition_tpu.ops.attention import func_attention
    _, attn = func_attention(words, img_features.astype(jnp.float32), gamma1,
                             query_mask=word_mask)
    return loss0, loss1, attn


def global_loss(cnn_code: jnp.ndarray, rnn_code: jnp.ndarray,
                eps: float = 1e-8, temp3: float = 10.0) -> jnp.ndarray:
    """CLIP-style symmetric CE on the B x B cosine matrix
    (reference: models/losses.py:329-351 — the BERT trainer's 'CLIP loss')."""
    b = cnn_code.shape[0]
    labels = jnp.arange(b)
    loss0, loss1 = sent_loss(cnn_code, rnn_code, labels, None, gamma3=temp3, eps=eps)
    return loss0 + loss1


def clip_loss(text_features: jnp.ndarray, image_features: jnp.ndarray,
              logit_scale: float = 1.0) -> jnp.ndarray:
    """Standard InfoNCE CLIP loss (reference: models/losses.py:268-309
    `ClipLoss`, used by the LSTM trainer)."""
    b = image_features.shape[0]
    labels = jnp.arange(b)
    logits_per_image = logit_scale * image_features.astype(jnp.float32) @ \
        text_features.astype(jnp.float32).T
    logits_per_text = logits_per_image.T
    return (cross_entropy_rows(logits_per_image, labels) +
            cross_entropy_rows(logits_per_text, labels)) / 2.0


def clip_soft_loss(text_embeddings: jnp.ndarray, image_embeddings: jnp.ndarray,
                   temperature: float) -> jnp.ndarray:
    """Soft-target CLIP variant (reference: models/losses.py:145-166 —
    standalone `clip_loss` function; kept for capability parity)."""
    te = text_embeddings.astype(jnp.float32)
    ie = image_embeddings.astype(jnp.float32)
    logits = te @ ie.T / temperature
    images_similarity = ie @ ie.T
    texts_similarity = te @ te.T
    targets = jax.nn.softmax((images_similarity + texts_similarity) / 2 * temperature,
                             axis=-1)
    texts_loss = jnp.sum(-targets * jax.nn.log_softmax(logits, axis=-1), axis=1)
    images_loss = jnp.sum(-targets.T * jax.nn.log_softmax(logits.T, axis=-1), axis=1)
    return jnp.mean((images_loss + texts_loss) / 2.0)


def cmpc_loss(text_embeddings: jnp.ndarray, image_embeddings: jnp.ndarray,
              labels: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    """Cross-Modal Projection Classification (reference: models/losses.py:184-211).

    W: (feature_dim, num_classes) learnable projection (owned by the caller's
    param tree; the reference keeps it as an nn.Parameter in CMPLoss)."""
    W = W.astype(jnp.float32)
    W_norm = W / jnp.linalg.norm(W, axis=0, keepdims=True)
    ie = image_embeddings.astype(jnp.float32)
    te = text_embeddings.astype(jnp.float32)
    image_norm = ie / jnp.linalg.norm(ie, axis=1, keepdims=True)
    text_norm = te / jnp.linalg.norm(te, axis=1, keepdims=True)
    image_proj_text = jnp.sum(ie * text_norm, axis=1, keepdims=True) * text_norm
    text_proj_image = jnp.sum(te * image_norm, axis=1, keepdims=True) * image_norm
    image_logits = image_proj_text @ W_norm
    text_logits = text_proj_image @ W_norm
    return cross_entropy_rows(image_logits, labels) + \
        cross_entropy_rows(text_logits, labels)


def cmpm_loss(text_embeddings: jnp.ndarray, image_embeddings: jnp.ndarray,
              labels: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Cross-Modal Projection Matching, KL-based
    (reference: models/losses.py:214-249)."""
    ie = image_embeddings.astype(jnp.float32)
    te = text_embeddings.astype(jnp.float32)
    labels_mask = (labels[:, None] - labels[None, :]) == 0
    image_norm = ie / jnp.linalg.norm(ie, axis=1, keepdims=True)
    text_norm = te / jnp.linalg.norm(te, axis=1, keepdims=True)
    image_proj_text = ie @ text_norm.T
    text_proj_image = te @ image_norm.T
    mask_f = labels_mask.astype(jnp.float32)
    # NB: reference normalizes by the l2 norm of each row's mask (norm(dim=1)),
    # not the row sum — preserved exactly.
    labels_mask_norm = mask_f / jnp.linalg.norm(mask_f, axis=1)
    i2t_pred = jax.nn.softmax(image_proj_text, axis=1)
    i2t = i2t_pred * (jax.nn.log_softmax(image_proj_text, axis=1) -
                      jnp.log(labels_mask_norm + epsilon))
    t2i_pred = jax.nn.softmax(text_proj_image, axis=1)
    t2i = t2i_pred * (jax.nn.log_softmax(text_proj_image, axis=1) -
                      jnp.log(labels_mask_norm + epsilon))
    return jnp.mean(jnp.sum(i2t, axis=1)) + jnp.mean(jnp.sum(t2i, axis=1))


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss as the reference defines it (models/losses.py:313-325):
    (1 - p)^gamma applied to the *batch-mean* CE (logp is already reduced),
    not per-sample — preserved exactly."""
    logp = cross_entropy_rows(logits, labels)
    p = jnp.exp(-logp)
    return (1.0 - p) ** gamma * logp


def kl_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """VAE KL divergence (reference: models/losses.py:138-142)."""
    element = 1 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return jnp.mean(element) * -0.5
