"""Renumber identities 0..N, resize to 112x112, and augment so every subject
has >= 3 images.

Behavioral port of reference data/face2text/scripts/make_final_img_txt.py:21-97:
identities get consecutive integer names; images are resized to 112x112; when
a subject has fewer than 3 images, horizontally-flipped and +-10 deg rotated
copies are added (captions replicated alongside).

Usage:
  python tools/face2text_prep/make_final_img_txt.py \
      --images data/face2text/images_by_id --texts data/face2text/texts_by_id \
      --out_images data/face2text/images/all --out_texts data/face2text/text
"""

from __future__ import annotations

import argparse
import os
import shutil

from PIL import Image


def _augment(img: Image.Image, k: int) -> Image.Image:
    if k == 0:
        return img.transpose(Image.FLIP_LEFT_RIGHT)
    return img.rotate(10 if k % 2 else -10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--texts", required=True)
    ap.add_argument("--out_images", required=True)
    ap.add_argument("--out_texts", required=True)
    ap.add_argument("--img_size", type=int, default=112)
    ap.add_argument("--min_images", type=int, default=3)
    args = ap.parse_args()

    os.makedirs(args.out_images, exist_ok=True)
    os.makedirs(args.out_texts, exist_ok=True)
    idents = sorted(os.listdir(args.images))
    for new_id, ident in enumerate(idents):
        src_dir = os.path.join(args.images, ident)
        txt_dir = os.path.join(args.texts, ident)
        imgs = sorted(f for f in os.listdir(src_dir)
                      if f.lower().endswith((".jpg", ".png", ".jpeg")))
        out_i = os.path.join(args.out_images, str(new_id))
        out_t = os.path.join(args.out_texts, str(new_id))
        os.makedirs(out_i, exist_ok=True)
        os.makedirs(out_t, exist_ok=True)

        loaded = []
        for k, name in enumerate(imgs):
            img = Image.open(os.path.join(src_dir, name)).convert("RGB")
            img = img.resize((args.img_size, args.img_size), Image.BILINEAR)
            loaded.append((name, img))
            img.save(os.path.join(out_i, f"{new_id}_{k}.jpg"))
            txt = os.path.join(txt_dir, os.path.splitext(name)[0] + ".txt")
            if os.path.isfile(txt):
                shutil.copy2(txt, os.path.join(out_t, f"{new_id}_{k}.txt"))

        # guarantee >= min_images per subject via flip/rotate augmentation
        k = len(loaded)
        aug = 0
        while k < args.min_images and loaded:
            base_name, base = loaded[aug % len(loaded)]
            _augment(base, aug).save(os.path.join(out_i, f"{new_id}_{k}.jpg"))
            txt = os.path.join(txt_dir, os.path.splitext(base_name)[0] + ".txt")
            if os.path.isfile(txt):
                shutil.copy2(txt, os.path.join(out_t, f"{new_id}_{k}.txt"))
            k += 1
            aug += 1
    print(f"processed {len(idents)} identities")


if __name__ == "__main__":
    main()
