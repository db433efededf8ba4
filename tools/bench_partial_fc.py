"""Partial-FC at realistic identity counts on the 8-device CPU mesh.

Substantiates the class-sharding memory claim (parallel/partial_fc.py: W and
its optimizer state scale linearly with the identity count — the first
tensor to outgrow a chip on real face corpora; reference context:
models/metrics.py:17-60 instantiates the dense (num_classes, 640) ArcFace W
replicated per GPU, num_classes: 4500 in cfg/fusion_bert.yml) with measured
datapoints at 10^5-10^6 classes:

  * per-device bytes of the classifier shard (must be total/N — read from
    the actual addressable shards, not computed from the spec)
  * per-device bytes of the (B, C/N) logit block vs the dense (B, C)
  * wall time per step of the class-sharded loss+grad vs the dense
    replicated-W equivalent on one device (CPU — correctness-scale, the
    ratio is the artifact, not the absolute)

Runs the bare sharded_margin_ce value+grad (not the full fusion trainer):
the classifier term is the only part that scales with C, and this isolates
the scaling surface. One JSON line per (classes, dim) point.

Usage: python tools/bench_partial_fc.py [--classes 131072,1048576] [--dim 64]
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
    ap.add_argument("--classes", default="131072,1048576")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    cli = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{cli.devices}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P

    from text_guided_face_recognition_tpu import ops
    from text_guided_face_recognition_tpu.parallel import make_mesh
    from text_guided_face_recognition_tpu.parallel.partial_fc import (
        sharded_margin_ce)

    n = cli.devices
    mesh = make_mesh(n)
    b, d = cli.batch, cli.dim
    rng = np.random.default_rng(0)

    def fence(out):
        # VALUE fetch, not block_until_ready (the repo's timing rule:
        # readiness can resolve early through the TPU tunnel; a
        # device->host read of a scalar cannot). This tool pins the CPU
        # backend where block_until_ready is sound, but the fence keeps
        # the pattern safe to copy into TPU-side tools.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(leaf).ravel()[0])

    def timed(fn, *args):
        out = fn(*args)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(cli.steps):
            out = fn(*args)
        fence(out)
        return (time.perf_counter() - t0) / cli.steps * 1000.0, out

    for c in (int(x) for x in cli.classes.split(",")):
        assert c % n == 0, (c, n)
        emb = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        label = jnp.asarray(rng.integers(0, c, size=(b,)).astype(np.int32))
        w_host = rng.normal(size=(c, d)).astype(np.float32)

        # ---- class-sharded: W rows split over the mesh
        w_sh = jax.device_put(jnp.asarray(w_host),
                              NamedSharding(mesh, P("data", None)))
        shard_bytes = sorted({s.data.nbytes for s in w_sh.addressable_shards})
        emb_sh = jax.device_put(emb, NamedSharding(mesh, P("data")))
        lab_sh = jax.device_put(label, NamedSharding(mesh, P("data")))

        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P("data"), P("data", None), P("data")),
                 out_specs=(P(), P("data", None)), check_vma=False)
        def sharded_step(e, w, l):
            def f(w_):
                return sharded_margin_ce(e, w_, l, "data", head="arcface",
                                         s=30.0, m=0.5)
            loss, gw = jax.value_and_grad(f)(w)
            return loss, gw

        ms_sh, (loss_sh, gw) = timed(sharded_step, emb_sh, w_sh, lab_sh)

        # ---- dense replicated W on ONE device (the reference layout)
        w_dense = jnp.asarray(w_host)

        @jax.jit
        def dense_step(e, w, l):
            def f(w_):
                logits = ops.arc_margin_logits(e, w_, l, s=30.0, m=0.5)
                return ops.cross_entropy_rows(logits, l)
            return jax.value_and_grad(f)(w)

        ms_dense, (loss_dense, _) = timed(dense_step, emb, w_dense, label)

        print(json.dumps({
            "metric": f"partial_fc_stress_c{c}_d{d}",
            "classes": c, "dim": d, "devices": n, "batch": b,
            "w_bytes_total": int(w_sh.nbytes),
            "w_bytes_per_device": shard_bytes,
            "per_device_is_total_over_n":
                shard_bytes == [w_sh.nbytes // n],
            "logit_block_bytes_per_device": b * (c // n) * 4,
            "logit_bytes_dense": b * c * 4,
            "ms_per_step_sharded_cpu8": round(ms_sh, 2),
            "ms_per_step_dense_1dev": round(ms_dense, 2),
            "loss_matches_dense": bool(np.isclose(float(loss_sh),
                                                  float(loss_dense),
                                                  rtol=1e-5)),
            "grad_finite": bool(np.isfinite(np.asarray(
                jnp.linalg.norm(gw.astype(jnp.float32))))),
        }))


if __name__ == "__main__":
    main()
