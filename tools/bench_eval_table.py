"""A/B: pair-mode vs table-mode evaluation (`eval_table_mode`).

Times the full run_test path (loader -> forwards -> host score gather ->
AUC) both ways on a protocol-shaped synthetic pair list: P pairs drawn over
a small pool of distinct samples, mirroring the real verification protocol's
structure (1,193 subjects x 300 pairs over ~2.4k distinct images —
cfg/test.yml:15, data/face2text/scripts/test_list_identification.py:5-38).
Table mode embeds each distinct (image, first-caption) side once and scores
pairs by table lookup (engine/evaluate._table_score_loop), so BOTH the
device forwards and the host decode drop by the dedup ratio.

Timing note: this is a WALL-clock A/B of the end-to-end eval call (each
batch's host score gather is a value fetch, so the loop cannot resolve
early); through the axon tunnel the per-batch dispatch pacing (~15 ms)
favors table mode by the same ratio as the forwards do, and on a directly
attached TPU the compute does. The structural numbers (forward batches per
mode) are printed alongside the wall ratio.

Usage:
  python tools/bench_eval_table.py [--pairs 2048] [--batch 64] [--repeats 3]
      [--bert-type bert] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--bert-type", default="bert")
    ap.add_argument("--fusion", default="fcfm")
    ap.add_argument("--cpu", action="store_true")
    cli = ap.parse_args()

    import jax
    if cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine import evaluate as ev
    from text_guided_face_recognition_tpu.engine import prepare as prep

    args = TGFRConfig().replace(
        en_type="BERT", bert_type=cli.bert_type, synthetic=True,
        batch_size=cli.batch, num_workers=2, compute_dtype=(
            "float32" if cli.cpu else "bfloat16"),
        fusion_type=cli.fusion, fusion_final_dim=640, num_classes=64,
        is_ident=False, is_roc=False)
    test_dl, test_ds = prep.prepare_dataloader(args, "test")
    args.vocab_size = test_ds.n_words

    # protocol-shaped pair list: cli.pairs pairs over the synthetic split's
    # distinct images (the real list reuses each image in ~300 pairs)
    names = [n + ".jpg" for n in test_ds.filenames]
    rng = np.random.default_rng(0)
    a = rng.integers(0, len(names), cli.pairs)
    b = rng.integers(0, len(names), cli.pairs)
    test_ds.imgs_pair = [[names[i], names[j]] for i, j in zip(a, b)]
    test_ds.pair_label = [int(i == j) for i, j in zip(a, b)]

    text_encoder, text_head = prep.prepare_text_encoder(args)
    backbone = prep.prepare_backbone(args)
    image_head = prep.prepare_image_head(args)
    fusion_net = prep.prepare_fusion_net(args)

    distinct = {k for i in range(len(test_ds))
                for _, k in test_ds.pair_sides(i)}
    result = {
        "metric": "eval_table_mode_ab",
        "pairs": cli.pairs, "distinct_sides": len(distinct),
        "batch": cli.batch,
        "pair_mode_forward_batches":
            -(-cli.pairs // cli.batch),          # each computes both sides
        "table_mode_forward_batches": -(-len(distinct) // cli.batch),
    }
    metrics = {}
    for mode in ("pairs", "table"):
        margs = args.replace(eval_table_mode=(mode == "table"))
        margs.vocab_size = test_ds.n_words
        walls = []
        for r in range(cli.repeats + 1):  # +1 warm-up (compile)
            t0 = time.perf_counter()
            m = ev.run_test(margs, test_dl, backbone, image_head,
                            fusion_net, text_encoder, text_head)
            if r:
                walls.append(time.perf_counter() - t0)
        walls.sort()
        metrics[mode] = m
        result[f"wall_s_{mode}"] = round(walls[len(walls) // 2], 3)
        result[f"pairs_per_sec_{mode}"] = round(
            cli.pairs / walls[len(walls) // 2], 1)
    result["speedup_table_over_pairs"] = round(
        result["wall_s_pairs"] / result["wall_s_table"], 2)
    result["d_auc"] = round(
        abs(metrics["pairs"]["auc"] - metrics["table"]["auc"]), 8)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
