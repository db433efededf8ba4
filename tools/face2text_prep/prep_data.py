"""Parse the Face2Text raw_2.0.jsonl release into per-image caption files.

Behavioral port of reference data/face2text/scripts/prep_data.py:7-74:
each image gets a `<name>.txt` with exactly `captions_per_image` captions —
entries with fewer captions are replicated round-robin; extras truncated.

Usage:
  python tools/face2text_prep/prep_data.py --raw raw_2.0.jsonl \
      --out data/face2text/text_raw --captions_per_image 4
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", required=True, help="Face2Text raw_2.0.jsonl")
    ap.add_argument("--out", required=True, help="output text dir")
    ap.add_argument("--captions_per_image", type=int, default=4)
    args = ap.parse_args()

    captions = defaultdict(list)
    with open(args.raw) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            img = os.path.basename(rec["filename"])
            captions[img].append(rec["description"].strip().replace("\n", " "))

    os.makedirs(args.out, exist_ok=True)
    n = args.captions_per_image
    for img, caps in captions.items():
        # replicate to exactly n captions (reference :44-66)
        full = [caps[i % len(caps)] for i in range(n)]
        stem = os.path.splitext(img)[0]
        with open(os.path.join(args.out, stem + ".txt"), "w") as f:
            f.write("\n".join(full) + "\n")
    print(f"wrote {len(captions)} caption files to {args.out}")


if __name__ == "__main__":
    main()
