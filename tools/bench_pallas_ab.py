"""A/B the Pallas DAMSM kernel vs the XLA path inside the FULL stage-1 step.

ROADMAP #4: the fused kernel loses ~11% at the reference batch 32 (XLA's two
giant batched GEMMs overlap better), but its VMEM-resident pipeline should win
once the (B*T, B*R) logits tensor stops tiling cache-friendly — standalone-op
signal said crossover between B=128 and B=256. This measures the claim where
it matters: the complete jitted train step (losses + backward + optimizer) on
the real chip, same synthetic batch, pallas on/off.

Timing uses the scan-chained single-dispatch methodology (utils/benching.py)
— multi-dispatch async loops under-report through the TPU tunnel
(docs/BENCHMARKS.md "Methodology").

Usage: python tools/bench_pallas_ab.py [--batches 32,128,256] [--ks 4,24]
Prints one JSON line per (batch, kernel) cell plus a ratio line per batch.
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
    ap.add_argument("--batches", default="32,128,256")
    ap.add_argument("--ks", default=None,
                    help="comma-separated scan lengths, e.g. 4,24")
    ap.add_argument("--cpu", action="store_true")
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
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_steps)

    if args_cli.ks:
        ks = tuple(int(x) for x in args_cli.ks.split(","))
    else:
        ks = (2, 6) if args_cli.cpu else (4, 44)
    rng = np.random.default_rng(0)
    key = jax.random.key(0, impl="rbg")  # match the default dropout PRNG

    for B in [int(x) for x in args_cli.batches.split(",")]:
        batch = {
            "img": jnp.asarray(
                rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
            "caps": jnp.asarray(
                rng.integers(1000, 30000, (B, 24)).astype(np.int32)),
            "mask": jnp.ones((B, 24), jnp.int32),
            "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
        }
        cell = {}
        for use_pallas in (False, True):
            a = TGFRConfig().replace(
                en_type="BERT", bert_type="bert", synthetic=True,
                batch_size=B, num_workers=2, max_epoch=1,
                compute_dtype="bfloat16", is_DAMSM=True, is_CLIP=True,
                is_ident_loss=True, num_classes=4500, use_pallas=use_pallas)
            tr = Stage1Trainer(a)
            name = "pallas" if use_pallas else "xla"

            def inner(state, k):
                state, m = tr._train_step_fn(state, batch,
                                             tr.backbone.variables, k)
                return state, m["total_loss"]

            try:
                ms = time_chained_steps(inner, tr.state, key, ks=ks)
            except Exception as e:  # e.g. VMEM overflow at large B
                print(json.dumps({"metric": f"stage1_bert_{name}_b{B}",
                                  "error": f"{type(e).__name__}: {e}"[:200]}))
                continue
            v = B / ms * 1000.0
            cell[name] = v
            print(json.dumps({"metric": f"stage1_bert_{name}_b{B}",
                              "value": round(v, 1), "unit": "pairs/s/chip",
                              "ms_per_step": round(ms, 3)}))
        if len(cell) == 2:
            print(json.dumps({"metric": f"pallas_over_xla_b{B}",
                              "value": round(cell["pallas"] / cell["xla"], 4)}))


if __name__ == "__main__":
    main()
