"""A/B the step-time optimization candidates inside the FULL stage-1 step.

Profiled breakdown (tools/profile_step.py, B=32): the 14.2 ms step is a sea
of ~1.5 us ops — per-leaf optimizer chains (~2k ops), dropout RNG, casts —
not MXU-bound GEMMs. Candidates measured here, each as the complete jitted
train step on the real chip:

  * fused    — fused_optimizer=True (per-group flattened vector updates,
               engine/optim.make_partitioned_flat_tx)
  * rbg      — jax_default_prng_impl=rbg (hardware RNG for dropout masks;
               threefry is ALU-heavy on TPU; no parity constraint — torch
               dropout masks differ anyway)
  * fused+rbg

Timing: scan-chained marginal methodology (utils/benching.py).

Usage: python tools/bench_opt_ab.py [--batch 32] [--variants base,fused,...]
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

VARIANTS = ("base", "fused", "rbg", "fused_rbg",
            # r3: stacked same-shape buckets / bf16 Adam moments / lazy
            # (row-sparse) embedding-table Adam (config default is already
            # rbg dropout PRNG, so these are deltas against the rbg
            # production baseline)
            "stacked_rbg", "bf16m_rbg", "stacked_bf16m_rbg",
            "stackedsmall_rbg", "stackedsmall_bf16m_rbg",
            "lazyemb_bf16m_rbg", "lazyemb_rbg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--ks", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--wordpiece", action="store_true",
                    help="draw caps/mask from the staged corpus tokenized "
                         "with the corpus-trained WordPiece vocab (real "
                         "row-reuse distribution) and report reuse stats")
    args_cli = ap.parse_args()

    import jax
    if args_cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_steps)

    if args_cli.ks:
        ks = tuple(int(x) for x in args_cli.ks.split(","))
    else:
        ks = (2, 6) if args_cli.cpu else (4, 44)
    B = args_cli.batch
    rng = np.random.default_rng(0)
    if args_cli.wordpiece:
        # REAL token-id distribution (VERDICT r4 #5): captions drawn from
        # the staged corpus, tokenized with the corpus-trained WordPiece
        # vocab (data/wordpiece.py) — the row-reuse distribution
        # lazy_embedding_adam's cost model is priced against. Also report
        # the measured reuse stats.
        from text_guided_face_recognition_tpu.data import wordpiece
        root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
        corpus = os.path.join(root, "caption_assets", "face2text")
        wp = wordpiece.load_or_train(corpus)
        assert wp is not None, f"no caption corpus at {corpus}"
        texts = wordpiece.corpus_caption_texts(corpus)
        picks = rng.choice(len(texts), size=B, replace=False)
        enc = [wp(texts[i], 24) for i in picks]
        caps = np.stack([e[0] for e in enc])
        mask = np.stack([e[1] for e in enc])
        uniq = len(np.unique(caps))
        print(json.dumps({
            "metric": f"wordpiece_row_reuse_b{B}",
            "unique_rows_in_batch": uniq,
            "ids_per_batch": int(caps.size),
            "vocab_pieces": wp.vocab_size,
            "corpus_captions": len(texts),
            "note": "dense Adam updates every embedding-table row "
                    "(30522) per step regardless; lazy touches only "
                    "unique_rows_in_batch",
        }), flush=True)
        batch = {
            "img": jnp.asarray(
                rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
            "caps": jnp.asarray(caps.astype(np.int32)),
            "mask": jnp.asarray(mask.astype(np.int32)),
            "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
        }
    else:
        batch = {
            "img": jnp.asarray(
                rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
            "caps": jnp.asarray(
                rng.integers(1000, 30000, (B, 24)).astype(np.int32)),
            "mask": jnp.ones((B, 24), jnp.int32),
            "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
        }

    for variant in args_cli.variants.split(","):
        use_rbg = "rbg" in variant
        jax.config.update("jax_default_prng_impl",
                          "rbg" if use_rbg else "threefry2x32")
        a = TGFRConfig().replace(
            en_type="BERT", bert_type="bert", synthetic=True, batch_size=B,
            num_workers=2, max_epoch=1,
            fused_optimizer=("fused" in variant),
            # r3 remedies (VERDICT r2 #1): same-shape leaf-bucket stacked
            # optimizer updates and bf16 Adam moment storage
            stacked_optimizer=("stacked" in variant),
            # "stackedsmall": bucket only the tiny leaves (biases / LN
            # scales, the profiled copy-stall buffers); kernels per-leaf
            stack_max_elems=(32768 if "stackedsmall" in variant else 0),
            adam_moments_dtype=("bfloat16" if "bf16m" in variant
                                else "float32"),
            # "bf16g": bf16 grad tree at the jax.grad boundary
            # (engine/optim.cast_grads) — halves dW/clip/Adam grad traffic
            grads_dtype=("bfloat16" if "bf16g" in variant else "float32"),
            # "fusedln": single-kernel Pallas LayerNorm in the text tower
            fused_ln=("fusedln" in variant),
            # "withclip": pre-step text-encoder grad clip (the r1/r2
            # default; reference behavior is no clip, DEVIATIONS #3)
            apply_grad_clip=("withclip" in variant),
            # "fuseddrop": one-RNG-call dropout plan for the text tower
            fused_dropout=("fuseddrop" in variant),
            # "fbffn"/"fbattn"/"fbboth": Pallas half-layer mega-kernels in
            # the text tower (ops/block_pallas.py) — one kernel fwd + one
            # bwd per half-layer, all LN/dropout/residual glue inside
            fused_block=("tower" if "fbtower" in variant else
                         "both" if "fbboth" in variant else
                         "attn" if "fbattn" in variant else
                         "ffn" if "fbffn" in variant else "none"),
            lazy_embedding_adam=("lazyemb" in variant))
        tr = Stage1Trainer(a)

        def inner(state, k):
            state, m = tr._train_step_fn(state, batch,
                                         tr.backbone.variables, k)
            return state, m["total_loss"]

        # loss sanity on this variant (value fetch = execution fence);
        # run on a COPY — _train_step donates its state argument
        st_copy = jax.tree_util.tree_map(jnp.array, tr.state)
        st, m = tr._train_step(st_copy, batch, tr.backbone.variables,
                               jax.random.PRNGKey(7))
        loss = float(m["total_loss"])
        ms = time_chained_steps(inner, tr.state, jax.random.PRNGKey(0),
                                ks=ks)
        print(json.dumps({
            "metric": f"stage1_bert_b{B}_{variant}",
            "value": round(B / ms * 1000.0, 1), "unit": "pairs/s/chip",
            "ms_per_step": round(ms, 3),
            "loss_finite": bool(np.isfinite(loss)),
        }), flush=True)
    jax.config.update("jax_default_prng_impl", "threefry2x32")


if __name__ == "__main__":
    main()
