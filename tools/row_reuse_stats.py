"""Embedding-table row-reuse statistics under REAL tokenization (VERDICT r4 #5).

`lazy_embedding_adam`'s cost model (docs/DEVIATIONS.md #20) depends on how
many distinct token-embedding rows a batch actually touches. The r3/r4 A/B
that rejected the lazy path as default ran on HashTokenizer ids — near-uniform
over the 30522-row table, so a batch touched close to its B*T token-slot
count. Real captions are Zipfian: this tool measures the distribution that
matters, from the corpus-trained WordPiece cache (data/wordpiece.py).

Measured on caption_assets/face2text (55,236 train captions, 14,572-entry
WordPiece vocab), 2,000 random batches:

  * B=64 x 24 tokens = 1,536 token slots -> median **184** distinct rows
    (p5 168, p95 200); B=32 -> median 133.
  * top-64 token ids cover 87.8% of all token slots; top-256 cover 98.2%.
  * only **1,456** distinct ids appear in the whole train corpus -> dense
    Adam moves 30,522 rows every step to advance ~184.

Implication for DEVIATIONS #20: real tokenization makes the dense update
~8x MORE wasteful than the hash-era estimate (184 vs ~1.5k touched rows),
but it does not rescue the lazy path's measured rejection — the dominant
rejected cost was materializing the dense 30522x768 update tree the optax
contract forces (scatter into a zeros buffer), which is independent of the
touched-row count. The flag stays opt-in.

Usage: python tools/row_reuse_stats.py [--cache PATH] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import pickle

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", type=str,
                    default="caption_assets/face2text/"
                            "captions_bert-wordpiece.pickle")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--trials", type=int, default=2000)
    a = ap.parse_args()

    with open(a.cache, "rb") as f:
        train_caps = pickle.load(f)[0]
    caps = np.stack(train_caps)
    rng = np.random.default_rng(0)
    distinct = np.array([
        len(np.unique(caps[rng.integers(0, caps.shape[0], a.batch)]))
        for _ in range(a.trials)])
    _, counts = np.unique(caps.ravel(), return_counts=True)
    cum = np.cumsum(np.sort(counts)[::-1]) / counts.sum()
    print(json.dumps({
        "metric": f"distinct_embedding_rows_per_b{a.batch}_batch",
        "median": int(np.median(distinct)),
        "p5": int(np.percentile(distinct, 5)),
        "p95": int(np.percentile(distinct, 95)),
        "batch_token_slots": int(a.batch * caps.shape[1]),
        "corpus_distinct_ids": int(len(counts)),
        "top64_coverage": round(float(cum[63]), 3) if len(cum) > 63 else None,
        "unit": "rows",
    }))


if __name__ == "__main__":
    main()
