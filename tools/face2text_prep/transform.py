"""Heavier augmentation variant for generating additional test images.

Behavioral port of reference data/face2text/scripts/transform.py:10-75:
blur / color-jitter / noise variants at a larger canvas (144px default).

Usage:
  python tools/face2text_prep/transform.py --src <dir> --out <dir>
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def _variants(img: Image.Image, rng: np.random.Generator):
    yield "blur", img.filter(ImageFilter.GaussianBlur(radius=2))
    yield "jitter", ImageEnhance.Color(
        ImageEnhance.Brightness(img).enhance(1.2)).enhance(1.3)
    arr = np.asarray(img, np.float32)
    noise = rng.normal(0, 10, arr.shape)
    yield "noise", Image.fromarray(
        np.clip(arr + noise, 0, 255).astype(np.uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=144)
    ap.add_argument("--seed", type=int, default=100)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for root, _dirs, files in os.walk(args.src):
        for f in files:
            if not f.lower().endswith((".jpg", ".png")):
                continue
            img = Image.open(os.path.join(root, f)).convert("RGB")
            img = img.resize((args.size, args.size), Image.BILINEAR)
            stem = os.path.splitext(f)[0]
            for tag, v in _variants(img, rng):
                v.save(os.path.join(args.out, f"{stem}_{tag}.jpg"))
                n += 1
    print(f"wrote {n} augmented images to {args.out}")


if __name__ == "__main__":
    main()
