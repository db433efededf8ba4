"""Split identities into train/valid/test and write the filenames/class
pickles the data layer consumes.

Behavioral port of reference
data/face2text/scripts/create_train_test_filenames.py:14-65: identities are
split by subject — 4,500 train / 500 valid / remaining (1,193 in the shipped
release) test — producing `<split>/filenames.pickle` (list of "<id>_<k>" keys)
and `<split>/class_info.pickle` (parallel list of identity ints).

Usage:
  python tools/face2text_prep/create_train_test_filenames.py \
      --images data/face2text/images/all --out data/face2text \
      --n_train 4500 --n_valid 500
"""

from __future__ import annotations

import argparse
import os
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="dir of per-identity folders with <id>_<k>.jpg")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=4500)
    ap.add_argument("--n_valid", type=int, default=500)
    args = ap.parse_args()

    idents = sorted((d for d in os.listdir(args.images)
                     if d.isdigit()), key=int)
    splits = {
        "train": idents[: args.n_train],
        "valid": idents[args.n_train: args.n_train + args.n_valid],
        "test": idents[args.n_train + args.n_valid:],
    }
    for split, ids in splits.items():
        filenames, class_info = [], []
        for ident in ids:
            folder = os.path.join(args.images, ident)
            for f in sorted(os.listdir(folder)):
                if f.lower().endswith(".jpg"):
                    # keys carry the identity dir: "<id>/<id>_<k>" (the
                    # shipped pickles' format)
                    filenames.append(f"{ident}/{os.path.splitext(f)[0]}")
                    class_info.append(int(ident))
        split_dir = os.path.join(args.out, split)
        os.makedirs(split_dir, exist_ok=True)
        with open(os.path.join(split_dir, "filenames.pickle"), "wb") as f:
            pickle.dump(filenames, f, protocol=2)
        with open(os.path.join(split_dir, "class_info.pickle"), "wb") as f:
            pickle.dump(class_info, f, protocol=2)
        print(f"{split}: {len(ids)} subjects, {len(filenames)} images")


if __name__ == "__main__":
    main()
