"""Benchmark: stage-1 FCAM training throughput (face-caption pairs/sec/chip).

Measures the flagship configuration — frozen iresnet18 + bert-base text tower
+ full FCAM loss cocktail (DAMSM + CLIP-global + identity margins) + 3-group
optimizer — i.e. the reference's `train_encoders_bert.py` hot loop (batch 32,
cfg/train_bert.yml:41) as one jitted TPU step on synthetic device-resident
data (pure compute throughput; input pipeline overlaps on real runs).

Measurement methodology (utils/benching.py): the per-step time is the
MARGINAL cost between two single-dispatch chained loops of the train step
(one compiled `lax.while_loop` program with a dynamic trip count, run at
k=4 vs k=24), which (a) cancels dispatch/readiness overhead exactly and
(b) is immune to the TPU-tunnel artifact where `block_until_ready` over a
Python loop of async dispatches returns before chained executions retire
(it under-reported this step ~5x; see docs/BENCHMARKS.md "Methodology").

Prints SEVEN JSON lines (one per perf surface; VERDICT r3 #5 + r4 #1/#6/#7):
the stage-1 production-batch config (B=64, the measured throughput sweet
spot, validated by the learning curve behind cfg/train_bert_b64.yml),
stage-2 FCFM-BERT train step (reference batch 16) AND the validated
production batch (B=128, cfg/fusion_bert_b128.yml), the fused verification
forward at the measured 256-pair eval recommendation, the FULL reference
eval protocol at its real size (357,900 pairs / 1,193 subjects, table mode
+ rank-1 identification — tools/bench_full_protocol.py), serving latency
of the fused-embedding extraction path at the B=64 serving batch
(tools/bench_serving_latency.py), and LAST the flagship stage-1 line
{"metric", "value", "unit", "vs_baseline"} (last so the
driver's single-line parse keeps recording the headline metric). The
flagship is MEASURED first — in a long-lived process later measurements
inherit a churned host (the bench_all.py caveat) — and printed last.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
baseline is an engineering estimate of the reference stage-1 throughput on
its stated hardware (2x RTX 6000, README.md:59): ~8 GFLOPs/pair end-to-end,
DataParallel scatter/gather each step, and a Python loop of 32 small bmm
chains inside words_loss (models/losses.py:73-111) that serializes the
dominant loss — we estimate 200 pairs/s. Recorded here so the ratio is
auditable; BENCH_r*.json keeps the raw value either way.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_PAIRS_PER_SEC = 200.0  # documented estimate, see module docstring


def spmd_main():
    """--spmd: time the explicit shard_map stage-1 step on the 8-device
    virtual CPU mesh (correctness-scale SPMD artifact — all_gather'd
    contrastive negatives + psum'd grads actually executing multi-device;
    NOT a perf number). Prints its own JSON line."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.parallel import make_mesh
    from text_guided_face_recognition_tpu.parallel.spmd import (
        make_shardmap_train_step)

    n = 8
    B = 2 * n
    args = TGFRConfig().replace(
        en_type="BERT", bert_type="groupvit", synthetic=True, batch_size=B,
        num_workers=2, num_devices=n, max_epoch=1, compute_dtype="float32",
        num_classes=64)
    trainer = Stage1Trainer(args)
    mesh = make_mesh(n)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
        "caps": jnp.asarray(rng.integers(10, 49000, (B, 24)).astype(np.int32)),
        "mask": jnp.ones((B, 24), jnp.int32),
        "cls_id": jnp.asarray(rng.integers(0, 64, B).astype(np.int32)),
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
    repl = NamedSharding(mesh, P())
    state = jax.device_put(trainer.state, repl)
    frozen = jax.device_put(trainer.backbone.variables, repl)
    key = jax.random.PRNGKey(0)

    step = make_shardmap_train_step(trainer, mesh)
    state, metrics = step(state, batch, frozen, key)
    jax.block_until_ready(metrics["total_loss"])
    steps = 5
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch, frozen, key)
    loss = float(metrics["total_loss"])  # value fetch = execution fence
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "stage1_spmd_shardmap_step_cpu8",
        "value": round(steps * B / dt, 2),
        "unit": "pairs/s (8-device virtual CPU mesh; correctness-scale)",
        "devices": jax.device_count(),
        "loss_finite": bool(np.isfinite(loss)),
    }))

    # batch-sharded eval forward on the same mesh (VERDICT r3 #1): the
    # fused verification forward with pair batches sharded over 'data' —
    # correctness-scale artifact that the sharded eval path executes
    # multi-device (the reference's eval runs under DataParallel)
    from text_guided_face_recognition_tpu.engine import evaluate as ev
    from text_guided_face_recognition_tpu.engine import prepare as prep
    evargs = args.replace(num_devices=n, batch_size=B)
    bb = prep.prepare_backbone(evargs)
    bb_vars = ev._replicate_tree(bb.variables, mesh)
    img1 = np.asarray(batch["img"])
    img2 = img1[::-1].copy()
    (d1,), _ = ev._shard_eval([img1], mesh)
    (d2,), _ = ev._shard_eval([img2], mesh)
    out = ev._raw_pair_scores(bb.module, evargs.model_type, bb_vars, d1, d2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = ev._raw_pair_scores(bb.module, evargs.model_type, bb_vars,
                                  d1, d2)
    last = float(np.asarray(out)[0])  # value fetch = execution fence
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "eval_forward_sharded_cpu8",
        "value": round(steps * B / dt, 2),
        "unit": "pairs/s (8-device virtual CPU mesh; correctness-scale)",
        "sharded_devices": len(out.sharding.device_set),
        "score_finite": bool(np.isfinite(last)),
    }))


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if "--spmd" in sys.argv:
        return spmd_main()

    force_cpu = "--cpu" in sys.argv
    import jax
    if force_cpu:
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
    from text_guided_face_recognition_tpu.utils.xla_opts import (
        resolve_xla_opts)

    B = 32  # reference stage-1 BERT batch (cfg/train_bert.yml:41)
    args = TGFRConfig().replace(
        en_type="BERT", bert_type="bert", synthetic=True, batch_size=B,
        num_workers=2, max_epoch=1, compute_dtype="bfloat16",
        is_DAMSM=True, is_CLIP=True, is_ident_loss=True, num_classes=4500)

    trainer = Stage1Trainer(args)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
        "caps": jnp.asarray(rng.integers(1000, 30000, (B, 24)).astype(np.int32)),
        "mask": jnp.ones((B, 24), jnp.int32),
        "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
    }
    frozen = trainer.backbone.variables

    def inner(state, key):
        state, metrics = trainer._train_step_fn(state, batch, frozen, key)
        return state, metrics["total_loss"]

    # Same per-program compiler options the production trainers jit with
    # (None on non-TPU backends). ks/repeats: harness defaults — wide k
    # spread + deep min against the tunnel's two-sided marginal noise
    # (utils/benching.time_chained_steps docstring). Each timed run gets a
    # FRESH state copy: the chained program donates its state arg, so
    # reusing trainer.state for a second measurement would hit deleted
    # buffers (the "fresh state copies per arm" rule, docs/BENCHMARKS.md).
    def fresh(tree):
        return jax.tree_util.tree_map(jnp.copy, tree)

    ks = (2, 6) if force_cpu else (4, 44)
    ms = time_chained_steps(inner, fresh(trainer.state), trainer._dropout_key,
                            ks=ks, repeats=6,
                            compiler_options=resolve_xla_opts(args.xla_opts))
    pairs_per_sec_per_chip = B / (ms / 1000.0) / jax.device_count()
    flagship_line = json.dumps({
        "metric": "stage1_bert_train_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec_per_chip, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec_per_chip / BASELINE_PAIRS_PER_SEC, 3),
    })

    # The three secondary surfaces below each run fresh chained compiles
    # through the tunnel — the most failure-prone step. The try/finally
    # guarantees the flagship line is printed LAST on stdout whether they
    # succeed or die, so the driver's parse-the-final-JSON-line contract
    # holds and the already-measured flagship is never discarded.
    try:
        _secondary_surfaces(trainer, frozen, fresh, rng, ks, args,
                            force_cpu=force_cpu)
    finally:
        # flagship LAST: the driver parses the final JSON line as headline
        print(flagship_line)


def _secondary_surfaces(trainer, frozen, fresh, rng, ks, args,
                        force_cpu=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_steps)
    from text_guided_face_recognition_tpu.utils.xla_opts import (
        resolve_xla_opts)

    # ---- stage-1 production batch (B=64 sweet spot, cfg/train_bert_b64.yml;
    # LRs differ from the flagship config but step time does not depend on
    # them). Measured after the flagship, so it inherits a slightly churned
    # host — treat as a floor.
    B64 = 64
    batch64 = {
        "img": jnp.asarray(rng.normal(size=(B64, 112, 112, 3)).astype(np.float32)),
        "caps": jnp.asarray(rng.integers(1000, 30000, (B64, 24)).astype(np.int32)),
        "mask": jnp.ones((B64, 24), jnp.int32),
        "cls_id": jnp.asarray(rng.integers(0, 4500, B64).astype(np.int32)),
    }

    def inner64(state, key):
        state, metrics = trainer._train_step_fn(state, batch64, frozen, key)
        return state, metrics["total_loss"]

    ms64 = time_chained_steps(
        inner64, fresh(trainer.state), trainer._dropout_key,
        ks=ks, repeats=5, compiler_options=resolve_xla_opts(args.xla_opts))
    print(json.dumps({
        "metric": "stage1_bert_train_b64_production_pairs_per_sec_per_chip",
        "value": round(B64 / ms64 * 1000.0 / jax.device_count(), 2),
        "unit": "pairs/s/chip", "ms_per_step": round(ms64, 3),
    }))

    # ---- stage-2 FCFM-BERT train step (reference batch, cfg/fusion_bert.yml)
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    B2 = 16
    fargs = TGFRConfig().replace(
        en_type="BERT", bert_type="bert", synthetic=True, batch_size=B2,
        num_workers=2, max_epoch=1, fusion_type="fcfm", CONFIG_NAME="Fusion")
    ftrainer = FusionTrainer(fargs)
    fbatch = {
        "img": jnp.asarray(rng.normal(size=(B2, 112, 112, 3)).astype(np.float32)),
        "caps": jnp.asarray(rng.integers(1000, 30000, (B2, 24)).astype(np.int32)),
        "mask": jnp.ones((B2, 24), jnp.int32),
        "cls_id": jnp.asarray(rng.integers(0, 4500, B2).astype(np.int32)),
    }
    ffrozen = ftrainer.backbone.variables

    def finner(state, key):
        state, m = ftrainer._train_step_fn(state, fbatch, ffrozen, key)
        return state, m["loss"]

    # fresh copy: time_chained_steps donates its state arg (same rule as
    # the stage-1 arms above)
    fms = time_chained_steps(finner, fresh(ftrainer.state),
                             ftrainer._dropout_key, ks=ks, repeats=5)
    print(json.dumps({
        "metric": "stage2_fcfm_bert_train_pairs_per_sec_per_chip",
        "value": round(B2 / fms * 1000.0 / jax.device_count(), 2),
        "unit": "pairs/s/chip", "ms_per_step": round(fms, 3),
    }))

    # ---- stage-2 production batch (B=128, cfg/fusion_bert_b128.yml —
    # validated learning curve in docs/BENCHMARKS.md; VERDICT r4 #6). Same
    # trainer graph, larger batch: LRs don't affect step time.
    B128 = 128
    fbatch128 = {
        "img": jnp.asarray(rng.normal(size=(B128, 112, 112, 3)).astype(np.float32)),
        "caps": jnp.asarray(rng.integers(1000, 30000, (B128, 24)).astype(np.int32)),
        "mask": jnp.ones((B128, 24), jnp.int32),
        "cls_id": jnp.asarray(rng.integers(0, 4500, B128).astype(np.int32)),
    }

    def finner128(state, key):
        state, m = ftrainer._train_step_fn(state, fbatch128, ffrozen, key)
        return state, m["loss"]

    fms128 = time_chained_steps(finner128, fresh(ftrainer.state),
                                ftrainer._dropout_key, ks=ks, repeats=5)
    print(json.dumps({
        "metric": "stage2_fcfm_bert_train_b128_production_pairs_per_sec_per_chip",
        "value": round(B128 / fms128 * 1000.0 / jax.device_count(), 2),
        "unit": "pairs/s/chip", "ms_per_step": round(fms128, 3),
    }))

    # ---- fused verification forward (test.py path) at the 256-pair eval
    # batch (the measured recommendation, docs/BENCHMARKS.md)
    import __graft_entry__ as G
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_forward)
    fwd, ex = G.entry()
    variables, img1, img2, ids1, ids2, mask1, mask2 = ex

    def fwd_img_first(i1, v, i2, a, b, c, d):
        return fwd(v, i1, i2, a, b, c, d)

    def tile(x, n):
        return jnp.tile(x, (n,) + (1,) * (x.ndim - 1))

    mult = 32  # 8-pair entry batch * 32 = 256 pairs/call
    eargs = (tile(img1, mult), variables, tile(img2, mult), tile(ids1, mult),
             tile(ids2, mult), tile(mask1, mult), tile(mask2, mult))
    ems = time_chained_forward(fwd_img_first, eargs, ks=ks, repeats=5)
    b_eval = img1.shape[0] * mult
    print(json.dumps({
        "metric": "verification_forward_b256_pairs_per_sec_per_chip",
        "value": round(b_eval / ems * 1000.0 / jax.device_count(), 2),
        "unit": "pairs/s/chip", "ms_per_step": round(ems, 3),
    }))

    # ---- the reference eval protocol at its REAL size (VERDICT r4 #1):
    # 1,193 subjects x 300 pairs = 357,900 pair scores + rank-1
    # identification at test_sub=1193, table mode (the full protocol wall
    # a user sees end-to-end: synthetic-image generation, embedding table,
    # host-side scoring, metrics)
    import os as _os
    sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.abspath(__file__)), "tools"))
    import bench_full_protocol
    # --cpu: the full 1,193-subject table would grind for ages on the
    # 1-core host — shrink to a smoke-scale protocol (same code path)
    bench_full_protocol.run(skip_pair=True,
                            **({"n_subjects": 24, "n_imposters": 11,
                                "batch_size": 32} if force_cpu else {}))

    # ---- serving latency of the fused-embedding extraction path (VERDICT
    # r4 #7): engine/evaluate._embed_batch at the B=64 serving batch —
    # compute-only chained marginal + fenced through-tunnel wall p50
    # (docs/BENCHMARKS.md "Serving latency"). Cache is already configured
    # by this process; cpu propagates the short chain ks.
    import bench_serving_latency
    bench_serving_latency.run(batches="64", wall_calls=12, setup_cache=False,
                              cpu=force_cpu)


if __name__ == "__main__":
    main()
