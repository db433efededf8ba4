"""Heavier "fairness-split" augmentation for CelebA test-image generation.

Behavioral port of reference data/celeba/scripts/transform_fair.py:10-64
without the torchvision dependency (not installed here): per image —
  * random horizontal flip (p=0.5)
  * random rotation +-5 deg, white fill
  * gaussian blur, 3x3 kernel, sigma ~ U(2, 9)
  * color jitter: brightness factor ~ U(0.6, 1.4), hue shift ~ U(-0.5, 0.5)
  * additive gaussian pixel noise, std = sqrt(0.002)
implemented with PIL + numpy (identical math to the torchvision ops).

Usage:
  python tools/celeba_prep/transform_fair.py --src train/ --out trans/ [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
from PIL import Image


def _gaussian_blur3(x: np.ndarray, sigma: float) -> np.ndarray:
    """Separable 3x3 gaussian blur with edge replication
    (torchvision GaussianBlur(kernel_size=3) semantics)."""
    k = np.exp(-np.arange(-1, 2) ** 2 / (2.0 * sigma * sigma))
    k /= k.sum()
    pad = np.pad(x, ((1, 1), (0, 0), (0, 0)), mode="edge")
    x = k[0] * pad[:-2] + k[1] * pad[1:-1] + k[2] * pad[2:]
    pad = np.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return k[0] * pad[:, :-2] + k[1] * pad[:, 1:-1] + k[2] * pad[:, 2:]


def _adjust_hue(x: np.ndarray, shift: float) -> np.ndarray:
    """Shift hue by `shift` (in turns) in HSV space, vectorized."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = x.max(-1)
    minc = x.min(-1)
    v = maxc
    c = maxc - minc
    s = np.where(maxc > 0, c / np.maximum(maxc, 1e-12), 0.0)
    safe_c = np.maximum(c, 1e-12)
    h = np.where(maxc == r, ((g - b) / safe_c) % 6.0,
                 np.where(maxc == g, (b - r) / safe_c + 2.0,
                          (r - g) / safe_c + 4.0))
    h = np.where(c > 0, h / 6.0, 0.0)
    h = (h + shift) % 1.0
    # hsv -> rgb
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.stack([
        np.choose(i, [v, q, p, p, t, v]),
        np.choose(i, [t, v, v, q, p, p]),
        np.choose(i, [p, p, t, v, v, q]),
    ], axis=-1)
    return out


def trans(img: Image.Image, rng: random.Random,
          img_size: int = 112) -> np.ndarray:
    """One augmented image, float32 HWC in [0, 1]."""
    if rng.random() > 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    angle = rng.uniform(-5.0, 5.0)
    img = img.rotate(angle, resample=Image.BILINEAR,
                     fillcolor=(255, 255, 255))
    x = np.asarray(img, np.float32) / 255.0
    x = _gaussian_blur3(x, sigma=rng.uniform(2.0, 9.0))
    x = np.clip(x * rng.uniform(0.6, 1.4), 0.0, 1.0)      # brightness .4
    x = _adjust_hue(x, rng.uniform(-0.5, 0.5))            # hue .5
    noise = np.random.default_rng(rng.randrange(2 ** 31)).normal(
        0.0, 0.002 ** 0.5, x.shape).astype(np.float32)
    return np.clip(x + noise, 0.0, 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--img_size", type=int, default=112)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = random.Random(args.seed)
    folders = sorted(os.listdir(args.src), key=lambda x: int(x.split(".")[0]))
    for f in folders:
        os.makedirs(os.path.join(args.out, f), exist_ok=True)
        for name in sorted(os.listdir(os.path.join(args.src, f))):
            img = Image.open(os.path.join(args.src, f, name)).convert("RGB")
            x = trans(img, rng, args.img_size)
            Image.fromarray((x * 255.0 + 0.5).astype(np.uint8)).save(
                os.path.join(args.out, f, name))


if __name__ == "__main__":
    main()
