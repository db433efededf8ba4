"""Build CelebA verification/identification pair lists: per subject, 1
genuine pair + N imposter pairs.

Behavioral port of reference data/celeba/scripts/test_list_identification.py:
1-42: subjects sorted numerically, images within a subject sorted by the
trailing _<count> int; the genuine partner is the first remaining image after
popping index k; each of the first `imposters` OTHER subjects contributes one
randomly-chosen image as an imposter. Lines are '<img1> <img2> <label>'.

Usage:
  python tools/celeba_prep/test_list_identification.py --img_dir images/test \
      --out celeba_test_399_sub.txt [--imposters 399] [--genuine 1] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import random


def build_pairs(img_dir: str, imposters: int, genuine_per_sub: int,
                rng: random.Random):
    subjects = sorted(os.listdir(img_dir), key=int)
    per_sub = [sorted(os.listdir(os.path.join(img_dir, s)),
                      key=lambda x: int(x.split(".")[0].split("_")[-1]))
               for s in subjects]
    all_pairs = []
    for k in range(genuine_per_sub):
        for i, sub_imgs in enumerate(per_sub):
            sel = list(range(len(sub_imgs)))
            if len(sel) > 1:
                sel.pop(k)
            all_pairs.append(f"{sub_imgs[k]} {sub_imgs[sel[0]]} 1")
            others = per_sub[:i] + per_sub[i + 1:]
            for other in others[:imposters]:
                all_pairs.append(
                    f"{sub_imgs[k]} {rng.choice(other)} 0")
    return all_pairs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--imposters", type=int, default=399,
                    help="imposter pairs per subject (reference: 400 - 1)")
    ap.add_argument("--genuine", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    pairs = build_pairs(args.img_dir, args.imposters, args.genuine,
                        random.Random(args.seed))
    with open(args.out, "w") as f:
        for pair in pairs:
            f.write(pair + "\n")
    print(f"wrote {len(pairs)} pairs to {args.out}")


if __name__ == "__main__":
    main()
