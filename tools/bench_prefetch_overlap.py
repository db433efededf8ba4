"""Demonstrate (or bound) h2d/compute overlap of prefetch_to_device.

parallel/mesh.prefetch_to_device keeps up to `size` batches' device_put
transfers in flight ahead of consumption so the H2D copy of step n+1 can
overlap the device compute of step n. docs/BENCHMARKS.md's e2e caveat notes
this overlap was never demonstrated on this 1-core host — the measured e2e
number matched the SERIAL loader+h2d composition. This tool isolates the
question with a ZERO-decode loader (pre-materialized numpy batches): the
loader costs nothing, so the only two ingredients are the h2d transfer and
the device compute, and the three compositions bound each other:

  t_h2d        per-transfer cost with a VALUE fence after every transfer
               (upper bound: each fence adds a tunnel round trip)
  t_h2d_pipe   all K transfers in flight, ONE dependence-forced fence (a
               jitted reduction consuming one element of every batch) —
               the honest pipelined wire rate
  t_serial     per-batch: transfer -> fence -> compute -> fence
               (no overlap possible; ~t_h2d + t_comp)
  t_prefetch   prefetch_to_device(size=2) -> compute, one fence at the end
               (full overlap would give ~max(t_h2d_pipe, t_comp))
  overlap_fraction = (t_serial - t_prefetch) / (t_serial - full_overlap)
               where full_overlap = max(t_h2d_pipe, t_comp): 1.0 = the
               prefetched composition reaches the full-overlap bound;
               0.0 = transport serializes with execution on this machine.

Measured r4 finding (this tool, 2x16 batches, live chip): the first
measurement in a fresh process is warm-up-contaminated (t_comp read 218 ms
vs the honest 40 ms) — trust the --batches 16 runs, which reproduce.

The compute payload is a chained 2048x2048 bf16 matmul loop fed by the
batch (real data dependence; ~`--iters` MXU-bound iterations) sized near the
~130 ms a 4.8 MB batch costs over this tunnel. All phase totals are fenced
with VALUE fetches (never bare block_until_ready — it can resolve early
through the tunnel, docs/BENCHMARKS.md third trap). Totals over K batches
with one end fence are the same composition bench_e2e_pipeline.py uses for
its h2d row.

Usage: python tools/bench_prefetch_overlap.py [--batches 8] [--iters 400]
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
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=400,
                    help="matmul loop trips per compute step")
    ap.add_argument("--cpu", action="store_true")
    cli = ap.parse_args()

    import jax
    if cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.parallel.mesh import (
        prefetch_to_device)

    K, B = cli.batches, cli.batch_size
    rng = np.random.default_rng(0)
    batches = [{"img": rng.normal(size=(B, 112, 112, 3)).astype(np.float32),
                "caps": rng.integers(0, 30000, (B, 24)).astype(np.int32)}
               for _ in range(K)]
    nbytes = sum(v.nbytes for v in batches[0].values())

    @jax.jit
    def compute(carry, batch):
        x = carry + jnp.sum(batch["img"]) * 1e-9  # consume the transfer
        def body(_, m):
            return jnp.tanh(m @ w)
        w = jnp.eye(2048, dtype=jnp.bfloat16) * 0.999
        return jax.lax.fori_loop(0, cli.iters, body, x)

    carry0 = jnp.zeros((2048, 2048), jnp.bfloat16)

    def fence(x):
        return float(jnp.asarray(x).reshape(-1)[0])  # value fetch

    # warm compiles + one transfer
    dev0 = jax.device_put(batches[0])
    fence(compute(carry0, dev0))

    # --- t_h2d: K transfers back-to-back, value-fenced at the end
    t0 = time.perf_counter()
    devs = [jax.device_put(b) for b in batches]
    for d in devs:
        fence(d["img"])
    t_h2d = (time.perf_counter() - t0) / K
    del devs

    # --- t_h2d_pipe: K transfers all in flight, ONE dependence-forced fence
    @jax.jit
    def consume_all(xs):
        return sum(x[0, 0, 0, 0] for x in xs)

    # warm the K-ary reduction program (jit traces per list length)
    pre = [jax.device_put(b["img"]) for b in batches]
    fence(consume_all(pre))
    del pre
    t0 = time.perf_counter()
    devs = [jax.device_put(b["img"]) for b in batches]
    fence(consume_all(devs))
    t_h2d_pipe = (time.perf_counter() - t0) / K
    del devs

    # --- t_comp: K chained compute steps on resident data, fenced at end
    t0 = time.perf_counter()
    c = carry0
    for _ in range(K):
        c = compute(c, dev0)
    fence(c)
    t_comp = (time.perf_counter() - t0) / K

    # --- serial: transfer -> fence -> compute -> fence, per batch
    t0 = time.perf_counter()
    c = carry0
    for b in batches:
        d = jax.device_put(b)
        fence(d["img"])
        c = compute(c, d)
        fence(c)
    t_serial = (time.perf_counter() - t0) / K

    # --- prefetched: transfers issued 2 ahead by prefetch_to_device
    t0 = time.perf_counter()
    c = carry0
    for d in prefetch_to_device(iter(batches), mesh=None, size=2):
        c = compute(c, d)
    fence(c)
    t_pre = (time.perf_counter() - t0) / K

    full_overlap = max(t_h2d_pipe, t_comp)
    denom = t_serial - full_overlap
    overlap = (t_serial - t_pre) / denom if denom > 0 else float("nan")
    print(json.dumps({
        "metric": "prefetch_overlap",
        "batch_mbytes": round(nbytes / 1e6, 2),
        "t_h2d_fenced_ms": round(t_h2d * 1e3, 1),
        "t_h2d_pipelined_ms": round(t_h2d_pipe * 1e3, 1),
        "wire_mbytes_per_sec_pipelined": round(nbytes / 1e6 / t_h2d_pipe, 1),
        "t_compute_ms": round(t_comp * 1e3, 1),
        "t_serial_ms": round(t_serial * 1e3, 1),
        "t_prefetch_ms": round(t_pre * 1e3, 1),
        "overlap_fraction": round(overlap, 3),
        "note": ("1.0 = prefetched composition reaches the full-overlap "
                 "bound max(h2d_pipelined, compute); 0.0 = transport "
                 "serializes with execution here"),
    }))


if __name__ == "__main__":
    main()
