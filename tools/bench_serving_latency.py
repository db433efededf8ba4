"""Serving latency of the fused-embedding extraction path (VERDICT r4 #7).

Measures engine/evaluate._embed_batch — the single-side fused-embedding
forward behind engine/extract.py's serving table and every verification
score — at serving-shaped batches (default B = 1 / 8 / 64), flagship config
(frozen iresnet18 + bert-base tower + FCFM, bf16), two ways:

  * compute-only ms/call: the chained-marginal harness
    (utils/benching.time_chained_forward) — dispatch-free device time, the
    number a TPU-VM host would see per enqueued batch.
  * through-tunnel wall p50: fenced per-call wall time, each call fetching
    a value (the only honest fence through this tunnel — block_until_ready
    can resolve early, docs/BENCHMARKS.md "Methodology"). On this harness
    it is dominated by the ~15 ms/dispatch tunnel RPC; recorded as the
    end-to-end latency a client of THIS host observes.

Prints one JSON line per batch size.

Usage: python tools/bench_serving_latency.py [--batches 1,8,64] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def run(batches: str = "1,8,64", wall_calls: int = 30, cpu: bool = False,
        setup_cache: bool = True):
    """Measure and print one JSON line per batch size in `batches`.

    Callable from bench.py (driver line, warm-cache B=64) as well as the
    CLI below; `setup_cache=False` when the caller already configured the
    persistent compile cache."""
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if setup_cache:
        from text_guided_face_recognition_tpu.utils.cache import (
            enable_compile_cache)
        # cpu_policy="off": CPU AOT cache entries can SIGILL across
        # virtualized host identities (utils/cache.py docstring); TPU keeps
        # the tunnel cache
        enable_compile_cache(cpu_policy="off")
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine import evaluate as ev
    from text_guided_face_recognition_tpu.engine import prepare as prep
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_forward)

    args = TGFRConfig().replace(
        en_type="BERT", bert_type="bert", synthetic=True, batch_size=64,
        num_workers=2, compute_dtype="bfloat16", fusion_type="fcfm",
        fusion_final_dim=640, num_classes=4500, num_devices=1)
    te, th = prep.prepare_text_encoder(args)
    bb = prep.prepare_backbone(args)
    ih = prep.prepare_image_head(args)
    fu = prep.prepare_fusion_net(args)
    statics = (bb.module, ih.module, te.module, th.module, fu.module,
               args.en_type, args.model_type, args.fusion_type)
    # Weights travel as jit ARGUMENTS (device-resident), never as closure
    # constants: a closure capture would embed every parameter as an HLO
    # literal inside the chained program, and the tunnel's remote-compile
    # endpoint rejects the resulting multi-MB request body (HTTP 413).
    var_args = jax.device_put((bb.variables, ih.variables,
                               te.variables["params"],
                               th.variables["params"], fu.variables))

    def embed_img_first(im, c, m, fv, iv, tp, hp, fuv):
        return ev._embed_batch(*statics, fv, iv, tp, hp, fuv, im, c, m)

    rng = np.random.default_rng(0)
    for B in [int(x) for x in batches.split(",")]:
        img = jnp.asarray(rng.normal(size=(B, 112, 112, 3)).astype(np.float32))
        caps = jnp.asarray(rng.integers(1000, 30000, (B, 24)).astype(np.int32))
        mask = jnp.ones((B, 24), jnp.int32)

        # compute-only (chained marginal; median-of-repeats inside)
        ks = (2, 6) if cpu else (4, 44)
        ms_compute = time_chained_forward(
            embed_img_first, (img, caps, mask) + var_args,
            ks=ks, repeats=5)

        # through-tunnel wall: fenced per-call p50
        out = embed_img_first(img, caps, mask, *var_args)
        float(jnp.sum(out))  # warm + fence
        walls = []
        for _ in range(wall_calls):
            t0 = time.perf_counter()
            out = embed_img_first(img, caps, mask, *var_args)
            _ = float(jnp.sum(out))  # VALUE fetch = execution fence
            walls.append((time.perf_counter() - t0) * 1000.0)
        p50 = float(np.percentile(walls, 50))
        p99 = float(np.percentile(walls, 99))
        print(json.dumps({
            "metric": f"serving_embed_latency_b{B}",
            "compute_ms_per_call": round(ms_compute, 3),
            "wall_p50_ms": round(p50, 2), "wall_p99_ms": round(p99, 2),
            "unit": "ms/call (compute = chained marginal; wall = fenced "
                    "through-tunnel)",
            "embeddings_per_sec_compute": round(B / ms_compute * 1000.0, 1),
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1,8,64")
    ap.add_argument("--wall-calls", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    run(batches=a.batches, wall_calls=a.wall_calls, cpu=a.cpu)


if __name__ == "__main__":
    main()
