"""Build verification/identification pair lists.

Behavioral port of reference
data/face2text/scripts/test_list_identification.py:5-43: for each subject, one
genuine pair (two images of the subject) plus `n_imposters` imposter pairs
(first image vs an image of another subject), emitted as
`img1 img2 label` lines into `face2text_<split>_<n>_sub.txt`.

Usage:
  python tools/face2text_prep/test_list_identification.py \
      --images data/face2text/images/test --out test_299_sub.txt \
      --n_imposters 299
"""

from __future__ import annotations

import argparse
import os
import random
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="split image dir of <id>/<id>_<k>.jpg files")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_imposters", type=int, default=199)
    ap.add_argument("--seed", type=int, default=100)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    by_id = defaultdict(list)
    for root, _dirs, files in os.walk(args.images):
        for f in files:
            if f.lower().endswith(".jpg"):
                by_id[f.split("_")[0]].append(f)
    idents = sorted(by_id, key=lambda s: int(s) if s.isdigit() else s)

    lines = []
    for ident in idents:
        mine = sorted(by_id[ident])
        if len(mine) < 2:
            continue
        anchor = mine[0]
        lines.append(f"{anchor} {mine[1]} 1")
        others = [i for i in idents if i != ident]
        for _ in range(args.n_imposters):
            o = rng.choice(others)
            lines.append(f"{anchor} {rng.choice(by_id[o])} 0")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} pairs for {len(idents)} subjects to {args.out}")


if __name__ == "__main__":
    main()
