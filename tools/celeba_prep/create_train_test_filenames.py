"""Split CelebA identities into train/valid/test and write the filename +
class-info pickles.

Behavioral port of reference data/celeba/scripts/create_train_test_filenames.py:
1-64: identity folders sorted numerically; first 4500 -> train, next 500 ->
valid, rest (1217 in the shipped data) -> test; entries are '<id>/<stem>'
with the extension stripped, sorted within each identity by the trailing
_<count> integer; class ids are the folder numbers. Output format matches the
shipped data/celeba/{train,valid,test}/{filenames,class_info}.pickle exactly
(validated by tests/test_celeba_prep.py).

Usage:
  python tools/celeba_prep/create_train_test_filenames.py \
      --folder text_final/ --out out/ [--train 4500 --valid 500]
"""

from __future__ import annotations

import argparse
import os
import pickle


def split_identities(folder: str, n_train: int, n_valid: int):
    folders = sorted(os.listdir(folder), key=int)
    splits = {"train": folders[:n_train],
              "valid": folders[n_train:n_train + n_valid],
              "test": folders[n_train + n_valid:]}
    out = {}
    for split, idents in splits.items():
        filenames, cls_ids = [], []
        for ident in idents:
            cls_id = int(ident)
            entries = [os.path.join(ident, os.path.splitext(n)[0])
                       for n in os.listdir(os.path.join(folder, ident))]
            entries = sorted(entries, key=lambda x: int(x.split("_")[-1]))
            filenames += entries
            cls_ids += [cls_id] * len(entries)
        out[split] = (filenames, cls_ids)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", required=True,
                    help="per-identity folder tree (text_final/)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=4500)
    ap.add_argument("--valid", type=int, default=500)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    for split, (filenames, cls_ids) in split_identities(
            args.folder, args.train, args.valid).items():
        with open(os.path.join(args.out,
                               f"{split}_filenames.pickle"), "wb") as f:
            pickle.dump(filenames, f)
        with open(os.path.join(args.out,
                               f"{split}_class_info.pickle"), "wb") as f:
            pickle.dump(cls_ids, f)
        print(f"{split}: {len(filenames)} files, "
              f"{len(set(cls_ids))} identities")


if __name__ == "__main__":
    main()
