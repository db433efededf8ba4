"""A/B the frozen-backbone feature cache (engine/feature_cache.py).

Two measurements per stage, one JSON line each:

  * step  — chained-marginal train-step time (utils/benching.py) with the
            in-step backbone (batch carries "img") vs precomputed features
            (batch carries "img_gl"/"img_lc"), back-to-back in ONE process
            per the adoption rules in utils/benching.py.
  * refresh — wall time of one FrozenFeatureCache.refresh over a synthetic
            train set (the per-epoch cost the cache adds), reported as
            images/s plus the amortized ms/pair it adds to a step.

Net per-pair cost with the cache = step_ms/B + refresh_s*1000/N_images —
both printed so docs/BENCHMARKS.md can carry the honest amortized number.

Stages: stage1-bert (B=32 default, hot loop
/root/reference/src/train_encoders_bert.py:254-331), stage1-lstm (B=128,
src/train_encoders_lstm.py:217-318), stage2 (B=64 fcfm,
src/fusion_bert.py:194-238).

Usage: python tools/bench_feature_cache.py --stage stage1-bert
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
    ap.add_argument("--stage", choices=("stage1-bert", "stage1-lstm",
                                        "stage2"), default="stage1-bert")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--ks", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--refresh-n", type=int, default=0,
                    help="synthetic train-set size for the refresh timing "
                         "(0 = the synthetic default)")
    cli = ap.parse_args()

    import jax
    if cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine.feature_cache import (
        FrozenFeatureCache)
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_steps)

    stage = cli.stage
    B = cli.batch or {"stage1-bert": 32, "stage1-lstm": 128, "stage2": 64}[
        stage]
    ks = (tuple(int(x) for x in cli.ks.split(",")) if cli.ks
          else ((2, 6) if cli.cpu else (4, 44)))

    a = TGFRConfig().replace(synthetic=True, batch_size=B, num_workers=2,
                             max_epoch=1)
    if stage == "stage1-lstm":
        a = a.replace(en_type="LSTM", lambda_clip=1.0)
        tr = Stage1Trainer(a)
    elif stage == "stage1-bert":
        a = a.replace(en_type="BERT", bert_type="bert")
        tr = Stage1Trainer(a)
    else:
        a = a.replace(en_type="BERT", bert_type="bert", fusion_type="fcfm",
                      CONFIG_NAME="Fusion")
        tr = FusionTrainer(a)

    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(
            rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
        "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
    }
    if stage == "stage1-lstm":
        vocab = int(getattr(tr.args, "vocab_size", 0) or 200)
        batch["caps"] = jnp.asarray(
            rng.integers(1, max(2, vocab - 1), (B, 18)).astype(np.int32))
        batch["cap_len"] = jnp.asarray(rng.integers(5, 19, B).astype(np.int32))
    else:
        batch["caps"] = jnp.asarray(
            rng.integers(1000, 30000, (B, 24)).astype(np.int32))
        batch["mask"] = jnp.ones((B, 24), jnp.int32)

    # feature batch: the same images through the same frozen tower.
    # Round-trip the features through host numpy before closing over them:
    # embedding a TPU-resident jit OUTPUT as a tracing-time constant forces
    # a d2h fetch during lowering that the axon tunnel rejects
    # (InvalidArgument); host-built jnp arrays (like every other batch leaf
    # in this harness) embed fine.
    fwd = jax.jit(lambda v, x: tr.backbone.module.apply(v, x, train=False))
    out = fwd(tr.backbone.variables, batch["img"])
    batch_feat = {k: v for k, v in batch.items() if k != "img"}
    batch_feat["img_gl"] = jnp.asarray(np.asarray(out[0]))
    batch_feat["img_lc"] = jnp.asarray(np.asarray(out[1]))

    loss_key = "total_loss" if stage != "stage2" else "loss"
    results = {}
    for name, b in (("img", batch), ("cached", batch_feat)):
        def inner(state, k, _b=b):
            state, m = tr._train_step_fn(state, _b, tr.backbone.variables, k)
            return state, m[loss_key]

        # Each run gets a FRESH copy of the pristine trainer state:
        # time_chained_steps donates its state arg (matching the production
        # jit), and through the axon tunnel a donated buffer poisons every
        # later use of the SAME arrays — the second arm's lowering then dies
        # with InvalidArgument on a d2h fetch. tr.state itself must never be
        # passed into a donating run.
        st_copy = jax.tree_util.tree_map(jnp.array, tr.state)
        _, m = jax.jit(inner)(st_copy, jax.random.split(tr._dropout_key)[1])
        loss = float(m)
        del st_copy
        ms = time_chained_steps(inner,
                                jax.tree_util.tree_map(jnp.array, tr.state),
                                tr._dropout_key, ks=ks)
        results[name] = ms
        print(json.dumps({
            "metric": f"{stage}_b{B}_step_{name}",
            "value": round(B / ms * 1000.0, 1), "unit": "pairs/s/chip",
            "ms_per_step": round(ms, 3),
            "loss_finite": bool(np.isfinite(loss)),
        }), flush=True)

    # refresh cost over a synthetic train set
    cache = FrozenFeatureCache(tr.backbone, a)
    ds = tr.train_ds
    n = len(ds)
    cache.refresh(ds, tr.backbone.variables)  # compile + warm
    t = cache.refresh(ds, tr.backbone.variables)
    amort = t * 1000.0 / max(n, 1)  # ms per pair per epoch
    net_ms = results["cached"] / B + amort
    print(json.dumps({
        "metric": f"{stage}_refresh",
        "value": round(n / t, 1), "unit": "img/s",
        "n_images": n, "refresh_s": round(t, 3),
        "amortized_ms_per_pair": round(amort, 4),
        "net_pairs_per_sec": round(1000.0 / net_ms, 1),
        "note": "refresh is tunnel-h2d-bound on this harness; on a TPU-VM "
                "host the upload rides PCIe",
    }), flush=True)

    # compute-only rate of the refresh forward at the inference batch —
    # the wall refresh above is tunnel-wire-bound on this harness; on a
    # TPU-VM the refresh is bounded by THIS device forward instead, so the
    # honest epoch-level net there is
    #   steps/epoch * cached_step_ms + n / refresh_fwd_img_s
    # vs steps/epoch * img_step_ms.
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_forward)
    pb = min(cache.batch, max(n, 1))
    img_big = jnp.asarray(
        rng.normal(size=(pb, a.img_size, a.img_size, 3)).astype(np.float32))

    def fwd_img_first(img, v):
        return cache._fwd(v, img)

    fms = time_chained_forward(fwd_img_first,
                               (img_big, tr.backbone.variables), ks=ks)
    img_s = pb / fms * 1000.0
    steps_per_epoch = max(n, 1) / B
    net_vm_s = (steps_per_epoch * results["cached"] / 1000.0
                + n / img_s)
    base_vm_s = steps_per_epoch * results["img"] / 1000.0
    print(json.dumps({
        "metric": f"{stage}_refresh_fwd_compute_only",
        "value": round(img_s, 1), "unit": "img/s",
        "infer_batch": pb, "ms_per_call": round(fms, 3),
        "tpu_vm_epoch_net_speedup": round(base_vm_s / net_vm_s, 4),
        "note": "chained-marginal of the cache's jitted forward; the "
                "speedup models a compute-bound host (refresh off the "
                "step's critical path but still serial per epoch)",
    }), flush=True)


if __name__ == "__main__":
    main()
