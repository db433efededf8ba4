"""Regroup CelebA raw files (images or caption .txt) into per-identity folders.

Behavioral port of reference data/celeba/scripts/make_images_folder.py:1-40:
`mapping.txt` (header + "<new_idx> ... <orig_stem>" lines) maps each raw file
stem to its original CelebA filename; `identity_CelebA.txt`
("<orig_jpg> <identity>" lines) maps that to an identity; files land in
`<out>/<identity>/<name>`.

Usage:
  python tools/celeba_prep/make_images_folder.py --src raw/ --out text/ \
      --mapping mapping.txt --identity identity_CelebA.txt [--copy]
"""

from __future__ import annotations

import argparse
import os
import shutil


def load_mapping(path: str) -> dict:
    """new-index stem -> original CelebA jpg name (skips the header line)."""
    raw = {}
    with open(path) as f:
        lines = f.readlines()[1:]
    for line in lines:
        key = line.split(" ")[0]
        raw[key] = line.split(".")[0].split(" ")[-1] + ".jpg"
    return raw


def load_identity(path: str) -> dict:
    """original jpg name -> identity string."""
    ids = {}
    with open(path) as f:
        for line in f:
            parts = line.split(" ")
            ids[parts[0]] = parts[1].strip()
    return ids


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mapping", required=True)
    ap.add_argument("--identity", required=True)
    ap.add_argument("--copy", action="store_true",
                    help="copy instead of move (reference moves)")
    args = ap.parse_args(argv)

    raw_files = load_mapping(args.mapping)
    id_files = load_identity(args.identity)
    op = shutil.copy if args.copy else shutil.move

    for name in sorted(os.listdir(args.src)):
        org_file = raw_files[name.split(".")[0]]
        org_id = id_files[org_file]
        dst_dir = os.path.join(args.out, str(org_id))
        os.makedirs(dst_dir, exist_ok=True)
        op(os.path.join(args.src, name), os.path.join(dst_dir, name))


if __name__ == "__main__":
    main()
