"""Shared evaluation loops.

Behavioral ports of the reference eval layer (reference: utils/modules.py:92-168
`test`, src/train_encoders_bert.py:348-395 `Train.test`,
src/org_face_test.py:17-58): encode caption pairs, run the frozen backbone +
image head, fuse (concat | linear | fcfm), cosine-score the pairs, and report
AUC/EER/TPR@FPR (+rank-1 identification). Per-batch forwards are jitted once;
score accumulation is host-side numpy.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from text_guided_face_recognition_tpu.utils.metrics import (
    calculate_identification_acc,
    calculate_scores,
)

__all__ = ["validate_concat", "run_test", "org_face_test", "cosine_pairs"]


def cosine_pairs(out1: jnp.ndarray, out2: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    """torch nn.CosineSimilarity(dim=1, eps=1e-6) equivalent."""
    n1 = jnp.linalg.norm(out1, axis=1)
    n2 = jnp.linalg.norm(out2, axis=1)
    return jnp.sum(out1 * out2, axis=1) / jnp.maximum(n1 * n2, eps * eps)


def _encode_text(args, text_encoder, te_params, text_head, th_params,
                 caps, extra):
    """extra = attention mask (BERT) or cap_len (LSTM)."""
    if args.en_type == "BERT":
        words_raw, _ = text_encoder.apply({"params": te_params}, caps, extra)
        words_emb, sent_emb = text_head.apply({"params": th_params}, words_raw)
    else:
        words_emb, sent_emb = text_encoder.apply(
            {"params": te_params}, caps, extra, deterministic=True)
    return words_emb, sent_emb


def _backbone_feats(args, backbone, frozen_vars, img):
    out = backbone.module.apply(frozen_vars, img, train=False)
    if args.model_type == "adaface":
        gl, lc, _ = out
    else:
        gl, lc = out
    return gl, lc


def validate_concat(args, valid_dl, backbone, image_head_mod, ih_params,
                    ih_stats, text_encoder_mod, te_params,
                    text_head_mod, th_params) -> Dict[str, float]:
    """Stage-1 validation: concat(global_img_proj, sent) cosine verification
    (reference: src/train_encoders_bert.py:348-395)."""

    @jax.jit
    def fwd(img1, img2, cap1, cap2, x1, x2):
        _, s1 = _encode_text(args, text_encoder_mod, te_params,
                             text_head_mod, th_params, cap1, x1)
        _, s2 = _encode_text(args, text_encoder_mod, te_params,
                             text_head_mod, th_params, cap2, x2)
        g1, l1 = _backbone_feats(args, backbone, backbone.variables, img1)
        g2, l2 = _backbone_feats(args, backbone, backbone.variables, img2)
        vars_ih = {"params": ih_params, "batch_stats": ih_stats}
        p1, _ = image_head_mod.apply(vars_ih, g1, l1, train=False)
        p2, _ = image_head_mod.apply(vars_ih, g2, l2, train=False)
        o1 = jnp.concatenate([p1, s1], axis=1)
        o2 = jnp.concatenate([p2, s2], axis=1)
        return cosine_pairs(o1, o2)

    preds, labels = [], []
    xk = ("mask1", "mask2") if args.en_type == "BERT" else \
         ("cap_len1", "cap_len2")
    for batch in valid_dl:
        pred = fwd(batch["img1"], batch["img2"], batch["cap1"], batch["cap2"],
                   batch[xk[0]], batch[xk[1]])
        preds += np.asarray(pred).tolist()
        labels += np.asarray(batch["pair_label"]).tolist()
    return calculate_scores(preds, labels, args)


def run_test(args, test_dl, backbone, image_head, fusion_net,
             text_encoder, text_head) -> Dict[str, float]:
    """Full eval with fusion dispatch (reference: utils/modules.py:92-168).

    `image_head`, `fusion_net`, `text_encoder`, `text_head` are prepare.Bundle
    objects (fusion_net/text_head may be None for concat / LSTM)."""
    ih_vars = image_head.variables
    te_params = text_encoder.variables["params"]
    th_params = text_head.variables["params"] if text_head is not None else None
    th_mod = text_head.module if text_head is not None else None

    @jax.jit
    def fwd(img1, img2, cap1, cap2, x1, x2):
        w1, s1 = _encode_text(args, text_encoder.module, te_params,
                              th_mod, th_params, cap1, x1)
        w2, s2 = _encode_text(args, text_encoder.module, te_params,
                              th_mod, th_params, cap2, x2)
        g1, l1 = _backbone_feats(args, backbone, backbone.variables, img1)
        g2, l2 = _backbone_feats(args, backbone, backbone.variables, img2)
        p1, q1 = image_head.module.apply(ih_vars, g1, l1, train=False)
        p2, q2 = image_head.module.apply(ih_vars, g2, l2, train=False)

        if args.fusion_type == "concat":
            o1 = jnp.concatenate([p1, s1], axis=1)
            o2 = jnp.concatenate([p2, s2], axis=1)
        elif args.fusion_type == "linear":
            o1 = fusion_net.module.apply(fusion_net.variables, p1, s1)
            o2 = fusion_net.module.apply(fusion_net.variables, p2, s2)
        elif args.fusion_type == "fcfm":
            if args.en_type == "LSTM":
                o1 = fusion_net.module.apply(fusion_net.variables, q1, w1)
                o2 = fusion_net.module.apply(fusion_net.variables, q2, w2)
            else:
                o1 = fusion_net.module.apply(fusion_net.variables, q1, w1,
                                             p1, s1, train=False)
                o2 = fusion_net.module.apply(fusion_net.variables, q2, w2,
                                             p2, s2, train=False)
        else:
            raise ValueError(args.fusion_type)
        return cosine_pairs(o1, o2)

    preds, labels = [], []
    xk = ("mask1", "mask2") if args.en_type == "BERT" else \
         ("cap_len1", "cap_len2")
    for batch in test_dl:
        pred = fwd(batch["img1"], batch["img2"], batch["cap1"], batch["cap2"],
                   batch[xk[0]], batch[xk[1]])
        preds += np.asarray(pred).tolist()
        labels += np.asarray(batch["pair_label"]).tolist()

    if args.is_ident:
        calculate_identification_acc(preds, args)
    return calculate_scores(preds, labels, args)


def get_img_features_dict(args, backbone) -> Dict[str, np.ndarray]:
    """Identification feature cache: global backbone features for every
    distinct image in the pair list (reference: utils/modules.py:174-188 —
    which recomputes per-image with batch 1; here images are batched)."""
    from text_guided_face_recognition_tpu.data.transforms import (
        decode_image, eval_transform)

    with open(args.test_pair_list) as fd:
        pairs = fd.readlines()
    names = sorted({p.split(" ")[0] for p in pairs} |
                   {p.split(" ")[1].strip() for p in pairs})

    @jax.jit
    def fwd(img):
        g, _ = _backbone_feats(args, backbone, backbone.variables, img)
        return g

    feats: Dict[str, np.ndarray] = {}
    bs = max(int(args.batch_size), 1)
    for i in range(0, len(names), bs):
        chunk = names[i:i + bs]
        imgs = np.stack([
            eval_transform(decode_image(
                os.path.join(args.data_dir, args.dataset_name, "test_images",
                             n), args.img_size), args.model_type)
            for n in chunk])
        pad = bs - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:pad])])
        out = np.asarray(fwd(jnp.asarray(imgs)))
        for n, f in zip(chunk, out):
            feats[n] = f
    return feats


def org_face_test(args, test_dl, backbone) -> Dict[str, float]:
    """COTS baseline: cosine on raw backbone global features, no text
    (reference: src/org_face_test.py:17-58)."""

    @jax.jit
    def fwd(img1, img2):
        g1, _ = _backbone_feats(args, backbone, backbone.variables, img1)
        g2, _ = _backbone_feats(args, backbone, backbone.variables, img2)
        return cosine_pairs(g1, g2)

    preds, labels = [], []
    for batch in test_dl:
        pred = fwd(batch["img1"], batch["img2"])
        preds += np.asarray(pred).tolist()
        labels += np.asarray(batch["pair_label"]).tolist()
    if args.is_ident:
        calculate_identification_acc(preds, args)
    return calculate_scores(preds, labels, args)
