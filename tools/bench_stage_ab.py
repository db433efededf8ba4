"""A/B step-time optimization candidates for the NON-flagship trainers.

tools/bench_opt_ab.py owns the stage-1 BERT matrix; this tool applies the
same remedies to the other two profiled steps (r2 VERDICT items 3/8):

  * --stage lstm    — stage-1 LSTM step at the reference batch 128
                      (cfg/train_lstm.yml:45; hot loop
                      /root/reference/src/train_encoders_lstm.py:217-318)
  * --stage stage2  — stage-2 FCFM-BERT fusion step (default batch 64, the
                      production recommendation of DEVIATIONS #16; reference
                      batch via --batch 16; hot loop
                      /root/reference/src/fusion_bert.py:194-238)

Variant tokens compose by substring, matching bench_opt_ab:
  unroll       — rnn_unroll=18 (LSTM only: fully unroll the bi-LSTM scans)
  bf16m        — bfloat16 Adam moment storage
  stackedsmall — stacked_optimizer with stack_max_elems=32768
  lazyemb      — row-sparse embedding-table Adam (needs a >=8192-row table)

Timing: chained-marginal methodology (utils/benching.py). One JSON line per
variant. Usage:
  python tools/bench_stage_ab.py --stage lstm --variants base,unroll,bf16m
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

LSTM_VARIANTS = ("base", "unroll", "bf16m", "unroll_bf16m",
                 "unroll_bf16m_stackedsmall")
STAGE2_VARIANTS = ("base", "bf16m", "stackedsmall", "bf16m_stackedsmall",
                   "lazyemb_bf16m")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("lstm", "stage2"), required=True)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--variants", default="")
    ap.add_argument("--ks", default=None)
    ap.add_argument("--cpu", action="store_true")
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
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_steps)

    is_lstm = args_cli.stage == "lstm"
    B = args_cli.batch or (128 if is_lstm else 64)
    variants = (args_cli.variants.split(",") if args_cli.variants
                else list(LSTM_VARIANTS if is_lstm else STAGE2_VARIANTS))
    if args_cli.ks:
        ks = tuple(int(x) for x in args_cli.ks.split(","))
    else:
        ks = (2, 6) if args_cli.cpu else (4, 44)

    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(
            rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
        "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
    }
    if not is_lstm:
        batch["caps"] = jnp.asarray(
            rng.integers(1000, 30000, (B, 24)).astype(np.int32))
        batch["mask"] = jnp.ones((B, 24), jnp.int32)

    for variant in variants:
        a = TGFRConfig().replace(
            synthetic=True, batch_size=B, num_workers=2, max_epoch=1,
            rnn_unroll=(18 if "unroll" in variant else 1),
            stacked_optimizer=("stacked" in variant),
            stack_max_elems=(32768 if "stackedsmall" in variant else 0),
            adam_moments_dtype=("bfloat16" if "bf16m" in variant
                                else "float32"),
            grads_dtype=("bfloat16" if "bf16g" in variant else "float32"),
            apply_grad_clip=("withclip" in variant),
            lazy_embedding_adam=("lazyemb" in variant))
        if is_lstm:
            a = a.replace(en_type="LSTM", lambda_clip=1.0)
            tr = Stage1Trainer(a)
            if "caps" not in batch:
                # token ids must stay inside the dataset-built vocab —
                # out-of-range ids hit jnp.take's NaN fill inside nn.Embed
                vocab = int(getattr(tr.args, "vocab_size", 0) or 200)
                batch["caps"] = jnp.asarray(
                    rng.integers(1, max(2, vocab - 1),
                                 (B, 18)).astype(np.int32))
                batch["cap_len"] = jnp.asarray(
                    rng.integers(5, 19, B).astype(np.int32))
        else:
            a = a.replace(en_type="BERT", bert_type="bert",
                          fusion_type="fcfm", CONFIG_NAME="Fusion")
            tr = FusionTrainer(a)

        def inner(state, k):
            state, m = tr._train_step_fn(state, batch,
                                         tr.backbone.variables, k)
            return state, (m["total_loss"] if "total_loss" in m
                           else m["loss"])

        # loss sanity on a state COPY (the train step donates its state arg)
        st_copy = jax.tree_util.tree_map(jnp.array, tr.state)
        _, m = tr._train_step(st_copy, batch, tr.backbone.variables,
                              jax.random.split(tr._dropout_key)[1])
        loss = float(m["total_loss"] if "total_loss" in m else m["loss"])
        ms = time_chained_steps(inner, tr.state, tr._dropout_key, ks=ks)
        print(json.dumps({
            "metric": f"{args_cli.stage}_b{B}_{variant}",
            "value": round(B / ms * 1000.0, 1), "unit": "pairs/s/chip",
            "ms_per_step": round(ms, 3),
            "loss_finite": bool(np.isfinite(loss)),
        }), flush=True)


if __name__ == "__main__":
    main()
