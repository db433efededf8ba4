"""Batch embedding extraction (serving utility).

Produces fused TGFR embeddings for every (image, caption) sample of a split —
the deployable artifact behind 1:1 verification and 1:N identification
(cosine on these vectors reproduces src/test.py's scores). Goes beyond the
reference surface, which only ships pair-list evaluation; here the embedding
table itself is exported for indexing/serving.

  python src/extract_embeddings.py --cfg cfg/test.yml --split test \
      --out embeddings.npz [--synthetic]

Writes an .npz with `keys` (sample keys), `embeddings` (N, fusion_dim) and
`class_ids` when identity metadata is present.
"""

from _bootstrap import parse_args, setup  # noqa: E402


def main():
    import argparse
    import sys
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--split", default="test",
                       choices=("train", "valid", "test"))
    extra.add_argument("--out", default="embeddings.npz")
    known, rest = extra.parse_known_args()
    sys.argv = [sys.argv[0]] + rest
    args = setup(parse_args("test.yml", "Extract fused TGFR embeddings"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.data import (
        DataLoader, TrainDataset, load_class_id)
    from text_guided_face_recognition_tpu.engine import prepare as prep

    # sample-level dataset (one row per image, first caption) via TrainDataset
    # with a fixed caption index policy
    dl, ds = prep.prepare_dataloader(args, "train" if known.split == "train"
                                     else known.split)
    # for valid/test the pair dataset is replaced by a flat sample dataset
    if known.split != "train":
        base_ds = ds
        names = base_ds.filenames
        ds = TrainDataset(names, base_ds.captions, base_ds.att_masks,
                          vocab=base_ds.vocab, args=args, split=known.split,
                          synthetic=base_ds.synthetic, seed=0)
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

    from text_guided_face_recognition_tpu.engine.evaluate import (
        _backbone_feats, _encode_text)

    @jax.jit
    def embed(img, caps, extra_in):
        th_mod = text_head.module if text_head is not None else None
        th_par = text_head.variables["params"] if text_head is not None else None
        w, s = _encode_text(args.en_type, text_encoder.module,
                            text_encoder.variables["params"], th_mod, th_par,
                            caps, extra_in)
        g, l = _backbone_feats(args.model_type, backbone.module,
                               backbone.variables, img)
        p, q = image_head.module.apply(image_head.variables, g, l, train=False)
        if args.fusion_type == "concat":
            return jnp.concatenate([p, s], axis=1)
        if args.fusion_type == "linear":
            return fusion_net.module.apply(fusion_net.variables, p, s)
        if args.en_type == "LSTM":
            return fusion_net.module.apply(fusion_net.variables, q, w)
        return fusion_net.module.apply(fusion_net.variables, q, w, p, s,
                                       train=False)

    keys, embs, cls = [], [], []
    xk = "mask" if args.en_type == "BERT" else "cap_len"
    for batch in dl:
        out = embed(batch["img"], batch["caps"], batch[xk])
        embs.append(np.asarray(out, dtype=np.float32))  # bf16 -> portable fp32
        keys += batch["key"].tolist()
        cls.append(np.asarray(batch["cls_id"]))

    embs = np.concatenate(embs)
    np.savez(known.out, keys=np.asarray(keys), embeddings=embs,
             class_ids=np.concatenate(cls))
    print(f"wrote {embs.shape[0]} embeddings of dim {embs.shape[1]} "
          f"to {known.out}")


if __name__ == "__main__":
    main()
