"""Shared evaluation loops.

Behavioral ports of the reference eval layer (reference: utils/modules.py:92-168
`test`, src/train_encoders_bert.py:348-395 `Train.test`,
src/org_face_test.py:17-58): encode caption pairs, run the frozen backbone +
image head, fuse (concat | linear | fcfm), cosine-score the pairs, and report
AUC/EER/TPR@FPR (+rank-1 identification). Score accumulation is host-side numpy.

Tracing note: the per-batch forwards are MODULE-LEVEL jitted functions whose
static arguments are the flax modules themselves (hashable by value) and the
config strings that pick the graph; parameters/variables are traced arguments.
Repeated validation calls during training therefore hit jax's own trace cache
instead of re-tracing a fresh closure every call.

Parallelism: the reference evaluates under nn.DataParallel (every module is
DataParallel-wrapped in utils/prepare.py:58 and the test loop in
utils/modules.py:92-168 runs multi-GPU). The TPU-native counterpart shards
each pair batch over the 1-D "data" mesh axis (parallel/mesh.py) with
parameters replicated: batches are padded up to a multiple of the mesh size
(scores for the padding rows are trimmed on the host — every per-pair
computation is sample-independent, so padding is exact), device_put with
P("data"), and the SAME module-level jitted forwards compile into SPMD
programs. `num_devices` in the config selects the mesh (0 = all visible
devices, matching DataParallel's all-GPUs default).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from text_guided_face_recognition_tpu.utils.metrics import (
    calculate_identification_acc,
    calculate_scores,
)

__all__ = ["validate_concat", "run_test", "org_face_test", "cosine_pairs",
           "eval_mesh"]


def eval_mesh(args):
    """The eval-time data mesh (or None when one device would be used).

    Mirrors the reference's DataParallel default of using every visible GPU
    (reference: utils/prepare.py:58): `num_devices` <= 0 means all visible
    devices. Unlike the train-side make_data_mesh, no divisibility
    constraint — eval batches are padded to the mesh size (_shard_eval).

    Multi-host runs: the eval loop gathers scores host-side (np.asarray of
    every batch's predictions), so the mesh spans only THIS process's
    devices — per-host DataParallel semantics; a device_put onto a global
    mesh would raise on non-addressable devices, and the gather could not
    read remote shards anyway. Split the pair list across hosts with the
    input pipeline's process sharding instead."""
    from text_guided_face_recognition_tpu.parallel.mesh import make_mesh
    n = int(getattr(args, "num_devices", 0) or 0)
    local = jax.local_devices() if jax.process_count() > 1 else None
    avail = len(local) if local is not None else jax.device_count()
    n = avail if n <= 0 else min(n, avail)
    return make_mesh(n, devices=local) if n > 1 else None


def _replicate_tree(tree, mesh):
    """device_put a variable/param tree replicated over the mesh (once per
    eval run, not per batch)."""
    if mesh is None or tree is None:
        return tree
    from text_guided_face_recognition_tpu.parallel.mesh import replicated
    return jax.device_put(tree, replicated(mesh))


def _shard_eval(arrays, mesh):
    """Pad each array's leading axis up to a multiple of the mesh size (by
    repeating row 0 — values are discarded) and device_put batch-sharded.
    Returns (sharded_arrays, real_n)."""
    n = int(arrays[0].shape[0])
    if mesh is None:
        return [jnp.asarray(a) for a in arrays], n
    from text_guided_face_recognition_tpu.parallel.mesh import batch_sharding
    size = mesh.size
    padded = ((n + size - 1) // size) * size
    sh = batch_sharding(mesh)
    out = []
    for a in arrays:
        a = np.asarray(a)
        if padded != n:
            a = np.concatenate([a, np.repeat(a[:1], padded - n, axis=0)])
        out.append(jax.device_put(a, sh))
    return out, n


def cosine_pairs(out1: jnp.ndarray, out2: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    """torch nn.CosineSimilarity(dim=1, eps=1e-6) equivalent: each norm is
    clamped to eps separately (torch's per-vector clamp semantics)."""
    n1 = jnp.linalg.norm(out1, axis=1)
    n2 = jnp.linalg.norm(out2, axis=1)
    return jnp.sum(out1 * out2, axis=1) / (jnp.maximum(n1, eps) *
                                           jnp.maximum(n2, eps))


def _encode_text(en_type, text_encoder, te_params, text_head, th_params,
                 caps, extra):
    """extra = attention mask (BERT) or cap_len (LSTM)."""
    if en_type == "BERT":
        words_raw, _ = text_encoder.apply({"params": te_params}, caps, extra)
        words_emb, sent_emb = text_head.apply({"params": th_params}, words_raw)
    else:
        words_emb, sent_emb = text_encoder.apply(
            {"params": te_params}, caps, extra, deterministic=True)
    return words_emb, sent_emb


def _backbone_feats(model_type, backbone_mod, frozen_vars, img):
    from text_guided_face_recognition_tpu.ops import device_normalize
    img = device_normalize(img, model_type)  # uint8_images wire mode
    out = backbone_mod.apply(frozen_vars, img, train=False)
    if model_type == "adaface":
        gl, lc, _ = out
    else:
        gl, lc = out
    return gl, lc


def _fused_embed(bb_mod, ih_mod, te_mod, th_mod, fu_mod,
                 en_type, model_type, fusion_type,
                 frozen_vars, ih_vars, te_params, th_params, fu_vars,
                 img, caps, extra):
    """One side's fused embedding — the deployable vector: cosine between two
    of these is exactly the pair score of utils/modules.py:104-151."""
    w, s = _encode_text(en_type, te_mod, te_params, th_mod, th_params,
                        caps, extra)
    g, l = _backbone_feats(model_type, bb_mod, frozen_vars, img)
    p, q = ih_mod.apply(ih_vars, g, l, train=False)
    if fusion_type == "concat":
        return jnp.concatenate([p, s], axis=1)
    if fusion_type == "linear":
        return fu_mod.apply(fu_vars, p, s)
    if fusion_type == "fcfm":
        if en_type == "LSTM":
            return fu_mod.apply(fu_vars, q, w)
        return fu_mod.apply(fu_vars, q, w, p, s, train=False)
    raise ValueError(fusion_type)


@functools.partial(
    jax.jit,
    static_argnames=("bb_mod", "ih_mod", "te_mod", "th_mod", "fu_mod",
                     "en_type", "model_type", "fusion_type"))
def _embed_batch(bb_mod, ih_mod, te_mod, th_mod, fu_mod,
                 en_type, model_type, fusion_type,
                 frozen_vars, ih_vars, te_params, th_params, fu_vars,
                 img, caps, extra):
    """Jitted single-side embedding batch (engine/extract.py serving path)."""
    return _fused_embed(bb_mod, ih_mod, te_mod, th_mod, fu_mod,
                        en_type, model_type, fusion_type,
                        frozen_vars, ih_vars, te_params, th_params, fu_vars,
                        img, caps, extra)


@functools.partial(
    jax.jit,
    static_argnames=("bb_mod", "ih_mod", "te_mod", "th_mod", "fu_mod",
                     "en_type", "model_type", "fusion_type"))
def _pair_scores(bb_mod, ih_mod, te_mod, th_mod, fu_mod,
                 en_type, model_type, fusion_type,
                 frozen_vars, ih_vars, te_params, th_params, fu_vars,
                 img1, img2, cap1, cap2, x1, x2):
    """One eval batch: encode both sides, fuse, cosine
    (reference: utils/modules.py:104-151)."""
    o1 = _fused_embed(bb_mod, ih_mod, te_mod, th_mod, fu_mod,
                      en_type, model_type, fusion_type,
                      frozen_vars, ih_vars, te_params, th_params, fu_vars,
                      img1, cap1, x1)
    o2 = _fused_embed(bb_mod, ih_mod, te_mod, th_mod, fu_mod,
                      en_type, model_type, fusion_type,
                      frozen_vars, ih_vars, te_params, th_params, fu_vars,
                      img2, cap2, x2)
    return cosine_pairs(o1, o2)


@functools.partial(jax.jit, static_argnames=("bb_mod", "model_type"))
def _raw_pair_scores(bb_mod, model_type, frozen_vars, img1, img2):
    g1, _ = _backbone_feats(model_type, bb_mod, frozen_vars, img1)
    g2, _ = _backbone_feats(model_type, bb_mod, frozen_vars, img2)
    return cosine_pairs(g1, g2)


@functools.partial(jax.jit, static_argnames=("bb_mod", "model_type"))
def _global_feats(bb_mod, model_type, frozen_vars, img):
    g, _ = _backbone_feats(model_type, bb_mod, frozen_vars, img)
    return g


def _table_score_loop(args, ds, embed, mesh=None, need_caption=True):
    """Pair scores via a deduplicated per-sample embedding table
    (`eval_table_mode`): embed each distinct (image, first-caption) side of
    the pair list ONCE, then score every pair as the cosine of two table
    rows — the identical math to _pair_scores (cosine(embed(a), embed(b)),
    see _fused_embed), but with ~100-300x fewer forwards at the real
    protocol scale (1,193 subjects x 300 pairs reference ~2.4k distinct
    samples for ~716k pair-side forwards; cfg/test.yml:15,
    data/face2text/scripts/test_list_identification.py:5-38).

    `embed` maps (img, caps, extra) -> (B, D) fused embeddings. Batches are
    padded to one static shape (and mesh-sharded like _score_loop), so the
    whole table costs ceil(N/B) executions of a single compiled program.
    """
    # distinct sides in first-appearance order, deduplicated on the FULL
    # image name (the caption key drops the extension, so two entries
    # differing only by extension are distinct images that must each get
    # their own table row)
    sides = [ds.pair_sides(i) for i in range(len(ds))]
    order, seen = [], {}
    for pair in sides:
        for name, key in pair:
            if name not in seen:
                seen[name] = len(order)
                order.append((name, key))

    bs = max(int(args.batch_size), 1)
    xk = "mask" if args.en_type == "BERT" else "cap_len"
    embs = []
    for i in range(0, len(order), bs):
        chunk = [ds.get_sample(n, k, need_caption=need_caption)
                 for n, k in order[i:i + bs]]
        cols = [np.stack([c["img"] for c in chunk])]
        if need_caption:
            cols.append(np.stack([c["cap"] for c in chunk]))
            cols.append(np.stack([c[xk] for c in chunk]))
        pad = bs - len(chunk)
        if pad:  # one static shape -> one compile (values trimmed below)
            cols = [np.concatenate([a, np.repeat(a[:1], pad, axis=0)])
                    for a in cols]
        arrs, _ = _shard_eval(cols, mesh)
        out = embed(*arrs)
        embs.append(np.asarray(out, np.float32)[:len(chunk)])
    table = np.concatenate(embs)

    i1 = np.asarray([seen[pair[0][0]] for pair in sides])
    i2 = np.asarray([seen[pair[1][0]] for pair in sides])
    # torch CosineSimilarity(eps=1e-6) semantics, matching cosine_pairs
    norms = np.maximum(np.linalg.norm(table, axis=1), 1e-6)
    preds = np.sum(table[i1] * table[i2], axis=1) / (norms[i1] * norms[i2])
    return preds.tolist(), list(ds.pair_label)


def _score_loop(args, dl, fwd, mesh=None) -> Dict[str, list]:
    preds, labels = [], []
    xk = ("mask1", "mask2") if args.en_type == "BERT" else \
         ("cap_len1", "cap_len2")
    for batch in dl:
        arrs, n = _shard_eval(
            [batch["img1"], batch["img2"], batch["cap1"], batch["cap2"],
             batch[xk[0]], batch[xk[1]]], mesh)
        pred = fwd(*arrs)
        preds += np.asarray(pred)[:n].tolist()
        labels += np.asarray(batch["pair_label"]).tolist()
    return preds, labels


def validate_concat(args, valid_dl, backbone, image_head_mod, ih_params,
                    ih_stats, text_encoder_mod, te_params,
                    text_head_mod, th_params) -> Dict[str, float]:
    """Stage-1 validation: concat(global_img_proj, sent) cosine verification
    (reference: src/train_encoders_bert.py:348-395). Batch-sharded over the
    eval mesh when more than one device is visible."""
    mesh = eval_mesh(args)
    ih_vars = _replicate_tree({"params": ih_params, "batch_stats": ih_stats},
                              mesh)
    bb_vars = _replicate_tree(backbone.variables, mesh)
    te_params = _replicate_tree(te_params, mesh)
    th_params = _replicate_tree(th_params, mesh)

    def fwd(img1, img2, cap1, cap2, x1, x2):
        return _pair_scores(
            backbone.module, image_head_mod, text_encoder_mod,
            text_head_mod, None, args.en_type, args.model_type, "concat",
            bb_vars, ih_vars, te_params, th_params, {},
            img1, img2, cap1, cap2, x1, x2)

    if getattr(args, "eval_table_mode", False):
        def embed(img, caps, extra):
            return _embed_batch(
                backbone.module, image_head_mod, text_encoder_mod,
                text_head_mod, None, args.en_type, args.model_type, "concat",
                bb_vars, ih_vars, te_params, th_params, {},
                img, caps, extra)

        preds, labels = _table_score_loop(args, valid_dl.dataset, embed, mesh)
    else:
        preds, labels = _score_loop(args, valid_dl, fwd, mesh)
    return calculate_scores(preds, labels, args)


def run_test(args, test_dl, backbone, image_head, fusion_net,
             text_encoder, text_head) -> Dict[str, float]:
    """Full eval with fusion dispatch (reference: utils/modules.py:92-168).

    `image_head`, `fusion_net`, `text_encoder`, `text_head` are prepare.Bundle
    objects (fusion_net/text_head may be None for concat / LSTM).
    Batch-sharded over the eval mesh when more than one device is visible
    (the reference evals under DataParallel)."""
    mesh = eval_mesh(args)
    te_params = _replicate_tree(text_encoder.variables["params"], mesh)
    th_params = _replicate_tree(
        text_head.variables["params"] if text_head is not None else {}, mesh)
    th_mod = text_head.module if text_head is not None else None
    fu_mod = fusion_net.module if fusion_net is not None else None
    fu_vars = _replicate_tree(
        fusion_net.variables if fusion_net is not None else {}, mesh)
    bb_vars = _replicate_tree(backbone.variables, mesh)
    ih_vars = _replicate_tree(image_head.variables, mesh)

    def fwd(img1, img2, cap1, cap2, x1, x2):
        return _pair_scores(
            backbone.module, image_head.module, text_encoder.module,
            th_mod, fu_mod, args.en_type, args.model_type, args.fusion_type,
            bb_vars, ih_vars, te_params, th_params,
            fu_vars, img1, img2, cap1, cap2, x1, x2)

    if getattr(args, "eval_table_mode", False):
        def embed(img, caps, extra):
            return _embed_batch(
                backbone.module, image_head.module, text_encoder.module,
                th_mod, fu_mod, args.en_type, args.model_type,
                args.fusion_type, bb_vars, ih_vars, te_params, th_params,
                fu_vars, img, caps, extra)

        preds, labels = _table_score_loop(args, test_dl.dataset, embed, mesh)
    else:
        preds, labels = _score_loop(args, test_dl, fwd, mesh)

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

    mesh = eval_mesh(args)
    bb_vars = _replicate_tree(backbone.variables, mesh)
    feats: Dict[str, np.ndarray] = {}
    bs = max(int(args.batch_size), 1)
    if mesh is not None:  # keep the single static shape mesh-divisible
        bs = ((bs + mesh.size - 1) // mesh.size) * mesh.size
    for i in range(0, len(names), bs):
        chunk = names[i:i + bs]
        imgs = np.stack([
            eval_transform(decode_image(
                os.path.join(args.data_dir, args.dataset_name, "test_images",
                             n), args.img_size), args.model_type)
            for n in chunk])
        pad = bs - len(chunk)
        if pad:
            # zeros of the full pad width (zeros_like(imgs[:pad]) would cap
            # at len(chunk) rows and leave a ragged final batch -> an extra
            # jit compile for the odd shape)
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        (dev_imgs,), _ = _shard_eval([imgs], mesh)
        out = np.asarray(_global_feats(backbone.module, args.model_type,
                                       bb_vars, dev_imgs))
        for n, f in zip(chunk, out):
            feats[n] = f
    return feats


def org_face_test(args, test_dl, backbone) -> Dict[str, float]:
    """COTS baseline: cosine on raw backbone global features, no text
    (reference: src/org_face_test.py:17-58). Batch-sharded over the eval
    mesh like run_test."""
    mesh = eval_mesh(args)
    bb_vars = _replicate_tree(backbone.variables, mesh)
    if getattr(args, "eval_table_mode", False):
        # per-image global-feature table (the reference's own
        # get_img_feactures_dict idea, utils/modules.py:174-188, applied to
        # the whole verification pass); image-only — captions are neither
        # loaded nor shipped on this path
        def embed(img):
            return _global_feats(backbone.module, args.model_type,
                                 bb_vars, img)

        preds, labels = _table_score_loop(args, test_dl.dataset, embed, mesh,
                                          need_caption=False)
    else:
        preds, labels = [], []
        for batch in test_dl:
            arrs, n = _shard_eval([batch["img1"], batch["img2"]], mesh)
            pred = _raw_pair_scores(backbone.module, args.model_type,
                                    bb_vars, *arrs)
            preds += np.asarray(pred)[:n].tolist()
            labels += np.asarray(batch["pair_label"]).tolist()
    if args.is_ident:
        calculate_identification_acc(preds, args)
    return calculate_scores(preds, labels, args)
