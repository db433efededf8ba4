"""A/B per-program XLA TPU compiler options against the stage-1/2 train step.

Why this exists: the per-op profile (tools/profile_step.py) shows ~2.6 ms of
the 10.8 ms stage-1 step is hundreds of small `copy-start/copy-done` weight
prefetches into alternate memory (S(1) = VMEM) that the latency-hiding
scheduler fails to hide. The scheduler/VMEM knobs that control this are XLA
TPU flags; `XLA_FLAGS` env vars never reach the server-side compiler through
the axon tunnel, but **per-program `compiler_options`** travel inside the
compile request and DO (utils/benching.chain_steps supports them).

Each variant compiles the COMPLETE jitted train step as one dynamic-trip
chained program (server-side compile, 5-25 min new; persistent-cached with
the options in the cache key, so re-runs resume) and times it with the
chained-marginal methodology. Option names are probed first on a trivial
program so a typo'd flag fails in seconds, not after a 20-minute compile.

Usage:
  python tools/bench_xla_opts.py [--stage 1] [--batch 32]
      [--variants base,vmem64,...]
      [--opt name=value ...]     # ad-hoc variant from CLI (repeatable)
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

# Candidate option sets. Values must be properly typed (bool/int/float) —
# the server rejects e.g. the string "false" for a bool flag.
VARIANTS: dict[str, dict] = {
    "base": {},
    # Scoped-VMEM budget for fusions: more room may let MSA keep more weight
    # tiles resident / prefetch deeper (v5e has 128 MiB VMEM).
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": 65536},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": 98304},
    # Everything experimental in the scheduler.
    "allsched": {"xla_tpu_enable_all_experimental_scheduler_features": True},
    # Scale the scheduler's async-copy bandwidth cost model: >1 models
    # copies as faster, letting the scheduler overlap more of them.
    "copybw2": {"xla_tpu_async_copy_bandwidth_scaling_factor": 2.0},
    # More scheduling effort.
    "lhs_rerun": {"xla_latency_hiding_scheduler_rerun": 2},
    # Latency-hiding scheduler off: isolates the scheduler's net effect on
    # the copy-stall pattern (diagnostic).
    "nolhs": {"xla_tpu_enable_latency_hiding_scheduler": False},
    # Compositions over the measured stage-1 winner (allsched +12%).
    "allsched_rerun": {
        "xla_tpu_enable_all_experimental_scheduler_features": True,
        "xla_latency_hiding_scheduler_rerun": 2,
    },
    "allsched_copybw": {
        "xla_tpu_enable_all_experimental_scheduler_features": True,
        "xla_tpu_async_copy_bandwidth_scaling_factor": 2.0,
    },
}


def probe(options: dict) -> str | None:
    """Compile a trivial program with `options`; return an error string if
    the server rejects any option name/value, else None."""
    import jax
    import jax.numpy as jnp
    try:
        fn = jax.jit(lambda x: x + 1.0)
        fn.lower(jnp.zeros((8,))).compile(compiler_options=dict(options))
        return None
    except Exception as e:  # noqa: BLE001 — report and move on
        return f"{type(e).__name__}: {e}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1, choices=(1, 2))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variants", default=None,
                    help="comma list from: " + ",".join(VARIANTS))
    ap.add_argument("--opt", action="append", default=[],
                    help="ad-hoc name=value (value parsed as bool/int/float "
                         "when possible); all --opt flags form ONE variant "
                         "named 'cli'")
    ap.add_argument("--ks", default=None)
    ap.add_argument("--repeats", type=int, default=2,
                    help="min-of-N repeats per k (marginal noise is "
                         "TWO-sided: use >=4 and a wide k spread for "
                         "adoption decisions)")
    ap.add_argument("--probe-only", action="store_true")
    args_cli = ap.parse_args()

    import jax
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.utils.benching import (
        time_chained_steps)

    todo: dict[str, dict] = {}
    for name in (args_cli.variants.split(",") if args_cli.variants
                 else list(VARIANTS)):
        todo[name] = VARIANTS[name]
    if args_cli.opt:
        opts = {}
        for kv in args_cli.opt:
            k, v = kv.split("=", 1)
            if v.lower() in ("true", "false"):
                v = v.lower() == "true"
            else:
                try:
                    v = int(v)
                except ValueError:
                    try:
                        v = float(v)
                    except ValueError:
                        pass
            opts[k] = v
        todo["cli"] = opts

    # Fast probe of every non-empty option set before any expensive compile.
    ok: dict[str, dict] = {}
    for name, opts in todo.items():
        err = probe(opts) if opts else None
        if err:
            print(json.dumps({"variant": name, "options": opts,
                              "error": err}), flush=True)
        else:
            ok[name] = opts
    if args_cli.probe_only:
        for name, opts in ok.items():
            print(json.dumps({"variant": name, "options": opts,
                              "probe": "ok"}), flush=True)
        return

    ks = (tuple(int(x) for x in args_cli.ks.split(","))
          if args_cli.ks else (4, 44))
    B = args_cli.batch
    rng = np.random.default_rng(0)

    batch = {
        "img": jnp.asarray(
            rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
        "caps": jnp.asarray(
            rng.integers(1000, 30000, (B, 24)).astype(np.int32)),
        "mask": jnp.ones((B, 24), jnp.int32),
        "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
    }
    if args_cli.stage == 1:
        from text_guided_face_recognition_tpu.engine.stage1 import (
            Stage1Trainer)
        cfg = TGFRConfig().replace(
            en_type="BERT", bert_type="bert", synthetic=True, batch_size=B,
            num_workers=2, max_epoch=1)
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
        tr = Stage1Trainer(cfg)
    else:
        from text_guided_face_recognition_tpu.engine.stage2 import (
            FusionTrainer)
        cfg = TGFRConfig().replace(
            en_type="BERT", bert_type="bert", fusion_type="fcfm",
            CONFIG_NAME="Fusion", synthetic=True, batch_size=B,
            num_workers=2, max_epoch=1)
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
        tr = FusionTrainer(cfg)

    def inner(state, k):
        state, m = tr._train_step_fn(state, batch,
                                     tr.backbone.variables, k)
        return state, (m["total_loss"] if "total_loss" in m else m["loss"])

    for name, opts in ok.items():
        state0 = jax.tree_util.tree_map(jnp.array, tr.state)
        try:
            ms = time_chained_steps(inner, state0, jax.random.PRNGKey(0),
                                    ks=ks, repeats=args_cli.repeats,
                                    compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "options": opts,
                              "error": f"{type(e).__name__}: {e}"[:400]}),
                  flush=True)
            continue
        print(json.dumps({
            "metric": f"stage{args_cli.stage}_b{B}_xla_{name}",
            "options": opts,
            "value": round(B / ms * 1000.0, 1), "unit": "pairs/s/chip",
            "ms_per_step": round(ms, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
