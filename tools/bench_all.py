"""Benchmark every pipeline stage on the current backend (one JSON line each).

Complements the driver-facing bench.py (which reports the single flagship
metric) with the full matrix from BASELINE.json's config list:
  * stage-1 BERT train step   (batch 32, cfg/train_bert.yml schedule shapes)
  * stage-1 LSTM train step   (batch 128, cfg/train_lstm.yml)
  * stage-2 FCFM-BERT step    (batch 16, cfg/fusion_bert.yml) + 32/64 sweep
  * fused verification forward (test.py path, batch 32 pairs)

All timings use the chained single-dispatch methodology (utils/benching.py)
— multi-dispatch async loops under-report through the TPU tunnel
(docs/BENCHMARKS.md "Methodology").

CAVEAT (r3, measured): this tool runs the WHOLE matrix in one long-lived
process, and later rows inherit a churned host (compile-cache writes, GC) —
a slow-biased t(k_small) once shrank the stage-2 B=16 marginal to 2.93 ms
vs the 5.84-5.99 ms a dedicated process reproduces 3x. Treat this matrix as
indicative; adoption-grade numbers come from the per-measurement tools
(bench.py, tools/bench_opt_ab.py, tools/bench_stage_ab.py) run one
measurement per process on an idle host.

Usage: python tools/bench_all.py [--cpu] [--ks 4,44]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ks", default=None,
                    help="comma-separated scan lengths, e.g. 4,24")
    args_cli = ap.parse_args()

    import jax
    if args_cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_forward,
        time_chained_steps,
    )

    if args_cli.ks:
        ks = tuple(int(x) for x in args_cli.ks.split(","))
    else:
        ks = (2, 6) if args_cli.cpu else (4, 44)
    rng = np.random.default_rng(0)
    key = jax.random.key(0, impl="rbg")  # match the default dropout PRNG
    results = []

    def synth_batch(B, bert=True, T=24):
        b = {"img": jnp.asarray(
                rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
             "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32))}
        if bert:
            b["caps"] = jnp.asarray(
                rng.integers(1000, 30000, (B, T)).astype(np.int32))
            b["mask"] = jnp.ones((B, T), jnp.int32)
        else:
            # ids must stay inside the dataset-built vocab (~200 synthetic
            # words) — out-of-range ids hit jnp.take's NaN fill in nn.Embed
            b["caps"] = jnp.asarray(
                rng.integers(1, 199, (B, 18)).astype(np.int32))
            b["cap_len"] = jnp.asarray(
                rng.integers(5, 19, B).astype(np.int32))
        return b

    def bench_trainer(trainer, batch, B, metric):
        frozen = trainer.backbone.variables

        def inner(state, k):
            state, m = trainer._train_step_fn(state, batch, frozen, k)
            scalar = m["total_loss"] if "total_loss" in m else m["loss"]
            return state, scalar

        ms = time_chained_steps(inner, trainer.state, key, ks=ks)
        results.append({"metric": metric, "value": round(B / ms * 1000.0, 1),
                        "unit": "pairs/s/chip",
                        "ms_per_step": round(ms, 3)})

    # stage-1 BERT (reference batch 32)
    a = TGFRConfig().replace(en_type="BERT", bert_type="bert", synthetic=True,
                             batch_size=32, num_workers=2, max_epoch=1)
    bench_trainer(Stage1Trainer(a), synth_batch(32), 32, "stage1_bert_train")

    # stage-1 LSTM (reference batch 128)
    a = TGFRConfig().replace(en_type="LSTM", synthetic=True, batch_size=128,
                             num_workers=2, max_epoch=1, lambda_clip=1.0)
    bench_trainer(Stage1Trainer(a), synth_batch(128, bert=False), 128,
                  "stage1_lstm_train")

    # stage-2 FCFM BERT: reference batch 16 + utilization sweep 32/64
    for B2 in (16, 32, 64):
        a = TGFRConfig().replace(en_type="BERT", bert_type="bert",
                                 synthetic=True, batch_size=B2, num_workers=2,
                                 max_epoch=1, fusion_type="fcfm",
                                 CONFIG_NAME="Fusion")
        suffix = "" if B2 == 16 else f"_b{B2}"
        bench_trainer(FusionTrainer(a), synth_batch(B2), B2,
                      f"stage2_fcfm_bert_train{suffix}")

    # fused-verification forward (test.py path), 32 pairs/batch
    import __graft_entry__ as G
    fwd, ex = G.entry()
    variables, img1, img2, ids1, ids2, mask1, mask2 = ex

    def fwd_img_first(img1_, variables_, img2_, ids1_, ids2_, mask1_, mask2_):
        return fwd(variables_, img1_, img2_, ids1_, ids2_, mask1_, mask2_)

    def tile(x, n):
        return jnp.tile(x, (n,) + (1,) * (x.ndim - 1))

    # entry() batch (8 pairs) + the measured eval recommendation (256 pairs,
    # +65% throughput — docs/BENCHMARKS.md verification-forward sweep)
    for mult in (1, 32):
        args_f = (tile(img1, mult), variables, tile(img2, mult),
                  tile(ids1, mult), tile(ids2, mult), tile(mask1, mult),
                  tile(mask2, mult))
        ms = time_chained_forward(fwd_img_first, args_f, ks=ks)
        b_eval = img1.shape[0] * mult
        results.append({"metric": f"verification_forward_b{b_eval}",
                        "value": round(b_eval / ms * 1000.0, 1),
                        "unit": "pairs/s/chip", "ms_per_step": round(ms, 3)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
