"""Batch embedding extraction — the serving layer.

Produces fused TGFR embeddings for every (image, caption) sample of a split:
the deployable artifact behind 1:1 verification and 1:N identification
(cosine between two of these vectors is exactly the pair score of the
reference's eval loop, utils/modules.py:104-151 — pinned by
tests/test_extract.py). Goes beyond the reference surface, which only ships
pair-list evaluation; here the embedding table itself is exported for
indexing/serving.

Parallelism: mesh-sharded exactly like engine/evaluate — sample batches are
padded to a multiple of the eval mesh and sharded over the "data" axis with
parameters replicated; padding rows are trimmed on the host (sample-
independent computation, so padding is exact). `num_devices` selects the
mesh (0 = all visible devices).

Determinism: eval transform (no augmentation) + the first caption per image
(`fixed_sent_ix = 0`, matching TestDataset's `sent_ix = 0` policy,
reference: utils/test_dataset.py:107-112).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["extract_embeddings"]


def extract_embeddings(args, split: str = "test",
                       out: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Extract the fused embedding of every sample in `split`.

    Returns {"keys": (N,) str, "embeddings": (N, fusion_dim) fp32,
    "class_ids": (N,)} and writes them as an .npz when `out` is given.
    """
    from text_guided_face_recognition_tpu.data import DataLoader, TrainDataset
    from text_guided_face_recognition_tpu.engine import prepare as prep
    from text_guided_face_recognition_tpu.engine.evaluate import (
        _embed_batch, _replicate_tree, _shard_eval, eval_mesh)

    dl, ds = prep.prepare_dataloader(
        args, "train" if split == "train" else split)
    # for valid/test the pair dataset is replaced by a flat sample dataset
    # (one row per image) via TrainDataset with a fixed caption index policy
    if split != "train":
        base_ds = ds
        ds = TrainDataset(base_ds.filenames, base_ds.captions,
                          base_ds.att_masks, vocab=base_ds.vocab, args=args,
                          split=split, synthetic=base_ds.synthetic, seed=0)
        ds.embeddings_num = args.captions_per_image
    # serving embeddings are deterministic: eval transform, first caption
    ds.augment = False
    ds.fixed_sent_ix = 0
    dl = DataLoader(ds, batch_size=args.batch_size, shuffle=False,
                    drop_last=False, num_workers=args.num_workers)

    text_encoder, text_head = prep.prepare_text_encoder(args)
    backbone = prep.prepare_backbone(args)
    image_head = prep.prepare_image_head(args)
    fusion_net = prep.prepare_fusion_net(args)

    mesh = eval_mesh(args)
    te_params = _replicate_tree(text_encoder.variables["params"], mesh)
    th_mod = text_head.module if text_head is not None else None
    th_params = _replicate_tree(
        text_head.variables["params"] if text_head is not None else {}, mesh)
    fu_mod = fusion_net.module if fusion_net is not None else None
    fu_vars = _replicate_tree(
        fusion_net.variables if fusion_net is not None else {}, mesh)
    bb_vars = _replicate_tree(backbone.variables, mesh)
    ih_vars = _replicate_tree(image_head.variables, mesh)

    keys, embs, cls = [], [], []
    xk = "mask" if args.en_type == "BERT" else "cap_len"
    for batch in dl:
        (img, caps, extra), n = _shard_eval(
            [batch["img"], batch["caps"], batch[xk]], mesh)
        emb = _embed_batch(
            backbone.module, image_head.module, text_encoder.module,
            th_mod, fu_mod, args.en_type, args.model_type, args.fusion_type,
            bb_vars, ih_vars, te_params, th_params, fu_vars,
            img, caps, extra)
        embs.append(np.asarray(emb, dtype=np.float32)[:n])  # bf16 -> fp32
        keys += batch["key"].tolist()
        cls.append(np.asarray(batch["cls_id"]))

    result = {"keys": np.asarray(keys), "embeddings": np.concatenate(embs),
              "class_ids": np.concatenate(cls)}
    if out:
        np.savez(out, **result)
    return result
