"""Regroup CelebA images and caption files by identity.

Behavioral port of reference data/face2text/scripts/make_images_folder.py and
make_text_folder.py (each ~30 lines): reads identity_CelebA.txt
(`<image> <identity>` per line, 202,599 lines) and copies every image/caption
that exists in the source dir into `<out>/<identity>/`.

Usage:
  python tools/face2text_prep/make_identity_folders.py \
      --identity identity_CelebA.txt --src img_align_celeba \
      --out data/face2text/images_by_id [--ext .jpg|.txt]
"""

from __future__ import annotations

import argparse
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--identity", required=True, help="identity_CelebA.txt")
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ext", default=None,
                    help="override extension (e.g. .txt for captions)")
    args = ap.parse_args()

    copied = 0
    with open(args.identity) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            img, ident = parts
            if args.ext:
                img = os.path.splitext(img)[0] + args.ext
            src = os.path.join(args.src, img)
            if not os.path.isfile(src):
                continue
            dst_dir = os.path.join(args.out, ident)
            os.makedirs(dst_dir, exist_ok=True)
            shutil.copy2(src, os.path.join(dst_dir, img))
            copied += 1
    print(f"copied {copied} files into identity folders under {args.out}")


if __name__ == "__main__":
    main()
