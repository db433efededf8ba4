"""Batch embedding extraction (serving utility) — CLI shim.

Produces fused TGFR embeddings for every (image, caption) sample of a split —
the deployable artifact behind 1:1 verification and 1:N identification
(cosine on these vectors reproduces src/test.py's scores). Goes beyond the
reference surface, which only ships pair-list evaluation; here the embedding
table itself is exported for indexing/serving. The implementation lives in
engine/extract.py (mesh-sharded like the eval loop); this file is the CLI
layer, mirroring the reference's src/-as-CLI layering.

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

    from text_guided_face_recognition_tpu.engine.extract import (
        extract_embeddings)
    result = extract_embeddings(args, split=known.split, out=known.out)
    print(f"wrote {result['embeddings'].shape[0]} embeddings of dim "
          f"{result['embeddings'].shape[1]} to {known.out}")


if __name__ == "__main__":
    main()
