"""1:N identification over an exported embedding table (serving utility).

Consumes the .npz written by src/extract_embeddings.py: ranks every probe
embedding against a gallery by cosine similarity and reports rank-1 / rank-5
identification accuracy by class id. Probes and gallery are disjoint halves
of each identity's samples (first sample -> gallery, rest -> probes).

  python tools/identify.py embeddings.npz [--topk 5]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--topk", type=int, default=5)
    args = ap.parse_args()

    z = np.load(args.npz, allow_pickle=True)
    emb = np.asarray(z["embeddings"], np.float32)
    cls = np.asarray(z["class_ids"])
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)

    # gallery = first occurrence of each class; probes = the rest
    gallery_idx, seen = [], set()
    for i, c in enumerate(cls):
        if c not in seen:
            seen.add(int(c))
            gallery_idx.append(i)
    gallery_idx = np.asarray(gallery_idx)
    probe_mask = np.ones(len(cls), bool)
    probe_mask[gallery_idx] = False
    probes = np.where(probe_mask)[0]
    if len(probes) == 0:
        print("no probes (every class has a single sample)")
        raise SystemExit(1)

    g = emb[gallery_idx]                      # (G, D)
    g_cls = cls[gallery_idx]
    sims = emb[probes] @ g.T                  # (P, G)
    order = np.argsort(-sims, axis=1)[:, : args.topk]
    ranked_cls = g_cls[order]                 # (P, topk)
    truth = cls[probes][:, None]

    rank1 = float(np.mean(ranked_cls[:, :1] == truth)) * 100
    rankk = float(np.mean(np.any(ranked_cls == truth, axis=1))) * 100
    print(f"gallery {len(gallery_idx)} ids | probes {len(probes)} | "
          f"rank-1 {rank1:.2f}% | rank-{args.topk} {rankk:.2f}%")


if __name__ == "__main__":
    main()
