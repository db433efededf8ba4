"""Renumber CelebA identities 0..N, resize to 112x112, and augment so every
subject has >= 5 images (captions copied alongside).

Behavioral port of reference data/celeba/scripts/make_final_img_txt.py:10-92:
identity folders (numeric names) are renumbered consecutively; every image is
resized; subjects with < 5 images get horizontally-flipped / +-10 deg-rotated
(white-filled) copies of the last image until they have 5. Output naming is
`<new_id>/<new_id>_<count>.{jpg,txt}` with count starting at 1 (matches the
shipped pickles: data/celeba/train/filenames.pickle entries '0/0_1', ...).
The reference script also carries a leftover `[0:50]` debug slice on the
identity loop; this port processes all identities.

Usage:
  python tools/celeba_prep/make_final_img_txt.py --images images/ --texts text/ \
      --out_images images_final/ --out_texts text_final/
"""

from __future__ import annotations

import argparse
import os
import random
import shutil

from PIL import Image


def _augment(img: Image.Image, rng: random.Random,
             degrees: float = 10.0) -> Image.Image:
    """hflip p=0.5 + uniform rotation, white fill (reference :21-37)."""
    if rng.random() > 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    angle = rng.uniform(-degrees, degrees)
    return img.rotate(angle, resample=Image.BILINEAR,
                      fillcolor=(255, 255, 255))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--texts", required=True)
    ap.add_argument("--out_images", required=True)
    ap.add_argument("--out_texts", required=True)
    ap.add_argument("--img_size", type=int, default=112)
    ap.add_argument("--min_images", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = random.Random(args.seed)
    text_folders = sorted(os.listdir(args.texts), key=int)
    img_folders = sorted(os.listdir(args.images), key=int)
    assert text_folders == img_folders, "image/text identity sets differ"

    for new_i, ident in enumerate(img_folders):
        iid_dir = os.path.join(args.images, ident)
        tid_dir = os.path.join(args.texts, ident)
        out_i = os.path.join(args.out_images, str(new_i))
        out_t = os.path.join(args.out_texts, str(new_i))
        os.makedirs(out_i, exist_ok=True)
        os.makedirs(out_t, exist_ok=True)

        names = sorted(os.listdir(iid_dir))
        count = 0
        img = None
        txt_src = None
        for name in names:
            img = Image.open(os.path.join(iid_dir, name)).convert("RGB")
            img = img.resize((args.img_size, args.img_size), Image.BILINEAR)
            count += 1
            img.save(os.path.join(out_i, f"{new_i}_{count}.jpg"))
            txt_src = os.path.join(
                tid_dir, os.path.splitext(name)[0] + ".txt")
            shutil.copy(txt_src, os.path.join(out_t, f"{new_i}_{count}.txt"))

        # reference :70-73,83-88: pad to min_images with augmented copies of
        # the LAST image (+ its caption)
        for _ in range(max(args.min_images - count, 0)):
            count += 1
            _augment(img, rng).save(
                os.path.join(out_i, f"{new_i}_{count}.jpg"))
            shutil.copy(txt_src, os.path.join(out_t, f"{new_i}_{count}.txt"))


if __name__ == "__main__":
    main()
