"""Benchmark every pipeline stage on the current backend (one JSON line each).

Complements the driver-facing bench.py (which reports the single flagship
metric) with the full matrix from BASELINE.json's config list:
  * stage-1 BERT train step   (batch 32, cfg/train_bert.yml schedule shapes)
  * stage-1 LSTM train step   (batch 128, cfg/train_lstm.yml)
  * stage-2 FCFM-BERT step    (batch 16, cfg/fusion_bert.yml)
  * fused-verification forward (test.py path, batch 32 pairs)

Usage: python tools/bench_all.py [--cpu] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def _bench(step_fn, state, batch, frozen, rng, steps, batch_size):
    import jax
    state, metrics = step_fn(state, batch, frozen, rng)  # compile
    jax.block_until_ready(jax.tree_util.tree_leaves(metrics)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, frozen, rng)
    jax.block_until_ready(jax.tree_util.tree_leaves(metrics)[0])
    dt = time.perf_counter() - t0
    return steps * batch_size / dt / jax.device_count()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    args_cli = ap.parse_args()

    import jax
    if args_cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    steps = args_cli.steps
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
            b["caps"] = jnp.asarray(
                rng.integers(1, 5000, (B, 18)).astype(np.int32))
            b["cap_len"] = jnp.asarray(
                rng.integers(5, 19, B).astype(np.int32))
        return b

    # stage-1 BERT (reference batch 32)
    a = TGFRConfig().replace(en_type="BERT", bert_type="bert", synthetic=True,
                             batch_size=32, num_workers=2, max_epoch=1)
    tr = Stage1Trainer(a)
    v = _bench(tr._train_step, tr.state, synth_batch(32),
               tr.backbone.variables, key, steps, 32)
    results.append({"metric": "stage1_bert_train", "value": round(v, 1),
                    "unit": "pairs/s/chip"})

    # stage-1 LSTM (reference batch 128)
    a = TGFRConfig().replace(en_type="LSTM", synthetic=True, batch_size=128,
                             num_workers=2, max_epoch=1, lambda_clip=1.0)
    tr = Stage1Trainer(a)
    v = _bench(tr._train_step, tr.state, synth_batch(128, bert=False),
               tr.backbone.variables, key, steps, 128)
    results.append({"metric": "stage1_lstm_train", "value": round(v, 1),
                    "unit": "pairs/s/chip"})

    # stage-2 FCFM BERT: reference batch 16 + utilization sweep 32/64
    # (VERDICT r02 item 7 — the chip is underutilized at the reference's 16)
    for B2 in (16, 32, 64):
        a = TGFRConfig().replace(en_type="BERT", bert_type="bert",
                                 synthetic=True, batch_size=B2, num_workers=2,
                                 max_epoch=1, fusion_type="fcfm",
                                 CONFIG_NAME="Fusion")
        tr = FusionTrainer(a)
        v = _bench(tr._train_step, tr.state, synth_batch(B2),
                   tr.backbone.variables, key, steps, B2)
        suffix = "" if B2 == 16 else f"_b{B2}"
        results.append({"metric": f"stage2_fcfm_bert_train{suffix}",
                        "value": round(v, 1), "unit": "pairs/s/chip"})

    # fused-verification forward (test.py path), 32 pairs/batch
    import __graft_entry__ as G
    fwd, ex = G.entry()
    jfwd = jax.jit(fwd)
    out = jax.block_until_ready(jfwd(*ex))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = jfwd(*ex)
    jax.block_until_ready(out)
    v = steps * ex[1].shape[0] / (time.perf_counter() - t0) / jax.device_count()
    results.append({"metric": "verification_forward", "value": round(v, 1),
                    "unit": "pairs/s/chip"})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
