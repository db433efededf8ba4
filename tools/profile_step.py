"""Device-op breakdown of the stage-1 train step (where do the ms go?).

Traces one scan-chained invocation of the flagship train step (same program
bench.py times) with jax.profiler — the device timeline through the axon
tunnel is real even though host-side dispatch timing is not — then parses the
xplane.pb and aggregates per-op device time.

Usage: python tools/profile_step.py [--batch 32] [--k 8] [--top 25]
                                    [--stage 1|2|lstm] [--cpu]
                                    [--rnn_unroll N] [--stack_max_elems N]
                                    [--adam_moments_dtype bfloat16]
                                    [--lazy_embedding_adam]
                                    [--xla_opts PRESET]
Optimizer/unroll knobs default to the production TGFRConfig defaults;
--xla_opts defaults to the stage's production preset (utils/xla_opts) so the
default invocation profiles exactly the program the trainers run.
Prints one JSON line per aggregated op group plus a total line; the per-step
cost is total_device_ms / k.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def parse_xplane(trace_dir: str):
    """Aggregate XEvent durations by op metadata name from the device's
    'XLA Ops' line — the serialized compute timeline. 'Async XLA Ops'
    (DMA/prefetch spans that overlap compute) and umbrella events (Steps /
    XLA Modules) are deliberately excluded: summing them double-counts.

    Returns (events_by_name: {name: total_ms}, plane_names: [str]).
    """
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto location moves across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    agg = collections.defaultdict(float)
    planes = []
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            nm = plane.name
            planes.append(nm)
            if "tpu" not in nm.lower() and "gpu" not in nm.lower():
                continue
            meta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name] += ev.duration_ps / 1e9  # ps -> ms
    return dict(agg), planes


GROUPS = (
    ("fusion", "fusion"),            # XLA fused elementwise/reduce kernels
    ("convolution", "conv"),
    ("dot", "matmul"),
    ("all-reduce", "collective"),
    ("all-gather", "collective"),
    ("copy", "copy"),
    ("dynamic", "dynamic-slice/update"),
    ("scatter", "scatter"),
    ("reduce", "reduce"),
    ("rng", "rng"),
    ("custom-call", "custom-call"),
)


def group_of(name: str) -> str:
    low = name.lower()
    for key, g in GROUPS:
        if key in low:
            return g
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--stage", default="1",
                    help="1 | 2 | lstm (stage-1 LSTM at its reference batch)")
    ap.add_argument("--rnn_unroll", type=int, default=None)
    ap.add_argument("--stack_max_elems", type=int, default=None,
                    help="0 disables stacked_optimizer; >0 sets threshold")
    ap.add_argument("--adam_moments_dtype", default=None)
    ap.add_argument("--lazy_embedding_adam", action="store_true")
    ap.add_argument("--fused_block", default=None,
                    choices=("none", "ffn", "attn", "both", "tower"),
                    help="Pallas mega-kernels in the text tower")
    ap.add_argument("--xla_opts", default=None,
                    help="preset name (utils/xla_opts); default = the "
                         "stage's production preset")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--feature-cache", action="store_true",
                    help="profile the frozen_feature_cache step shape "
                         "(batch carries precomputed gl/lc, no conv tower)")
    ap.add_argument("--trace-dir", default=None,
                    help="parse an existing trace instead of capturing")
    args_cli = ap.parse_args()

    import jax

    if args_cli.trace_dir is None:
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
        from text_guided_face_recognition_tpu.utils.benching import chain_steps

        B = args_cli.batch
        is_lstm = str(args_cli.stage) == "lstm"
        rng = np.random.default_rng(0)
        batch = {
            "img": jnp.asarray(
                rng.normal(size=(B, 112, 112, 3)).astype(np.float32)),
            "cls_id": jnp.asarray(rng.integers(0, 4500, B).astype(np.int32)),
        }
        if is_lstm:
            batch["caps"] = jnp.asarray(
                rng.integers(1, 5000, (B, 18)).astype(np.int32))
            batch["cap_len"] = jnp.asarray(
                rng.integers(5, 19, B).astype(np.int32))
        else:
            batch["caps"] = jnp.asarray(
                rng.integers(1000, 30000, (B, 24)).astype(np.int32))
            batch["mask"] = jnp.ones((B, 24), jnp.int32)
        overrides = {}
        if args_cli.rnn_unroll is not None:
            overrides["rnn_unroll"] = args_cli.rnn_unroll
        if args_cli.stack_max_elems is not None:
            overrides["stacked_optimizer"] = bool(args_cli.stack_max_elems)
            overrides["stack_max_elems"] = args_cli.stack_max_elems
        if args_cli.adam_moments_dtype is not None:
            overrides["adam_moments_dtype"] = args_cli.adam_moments_dtype
        if args_cli.lazy_embedding_adam:
            overrides["lazy_embedding_adam"] = True
        if args_cli.fused_block is not None:
            overrides["fused_block"] = args_cli.fused_block
        base = TGFRConfig().replace(
            synthetic=True, batch_size=B, num_workers=2, max_epoch=1,
            **overrides)
        if is_lstm:
            base = base.replace(en_type="LSTM", lambda_clip=1.0)
            tr = Stage1Trainer(base)
        elif str(args_cli.stage) == "2":
            base = base.replace(en_type="BERT", bert_type="bert",
                                fusion_type="fcfm", CONFIG_NAME="Fusion")
            tr = FusionTrainer(base)
        else:
            base = base.replace(en_type="BERT", bert_type="bert")
            tr = Stage1Trainer(base)
        frozen = tr.backbone.variables
        if args_cli.feature_cache:
            fwd = jax.jit(lambda v, x: tr.backbone.module.apply(
                v, x, train=False))
            out = fwd(frozen, batch.pop("img"))
            batch["img_gl"], batch["img_lc"] = out[0], out[1]

        def inner(state, k):
            state, m = tr._train_step_fn(state, batch, frozen, k)
            scalar = m["total_loss"] if "total_loss" in m else m["loss"]
            return state, scalar

        from text_guided_face_recognition_tpu.utils.xla_opts import (
            resolve_xla_opts)
        preset = args_cli.xla_opts
        if preset is None:
            preset = (base.xla_opts_stage2 if str(args_cli.stage) == "2"
                      else base.xla_opts)
        run = chain_steps(inner, donate=False,
                          compiler_options=resolve_xla_opts(preset))
        key = tr._dropout_key
        state, scalars = run(tr.state, key, args_cli.k)   # compile + warm
        jax.block_until_ready(scalars)

        trace_dir = tempfile.mkdtemp(prefix="tgfr_trace_")
        jax.profiler.start_trace(trace_dir)
        state, scalars = run(tr.state, key, args_cli.k)
        jax.block_until_ready(scalars)
        jax.profiler.stop_trace()
    else:
        trace_dir = args_cli.trace_dir

    agg, planes = parse_xplane(trace_dir)
    if not agg:
        print(json.dumps({"error": "no device events",
                          "planes": sorted(set(planes))}))
        return
    total = sum(agg.values())
    k = args_cli.k
    by_group = collections.defaultdict(float)
    for name, ms in agg.items():
        by_group[group_of(name)] += ms
    print(json.dumps({"metric": "device_total_ms_per_step",
                      "value": round(total / k, 3), "k": k,
                      "trace_dir": trace_dir}))
    for g, ms in sorted(by_group.items(), key=lambda x: -x[1]):
        print(json.dumps({"group": g, "ms_per_step": round(ms / k, 3),
                          "pct": round(100 * ms / total, 1)}))
    for name, ms in sorted(agg.items(), key=lambda x: -x[1])[:args_cli.top]:
        print(json.dumps({"op": name[:120], "ms_per_step": round(ms / k, 4),
                          "pct": round(100 * ms / total, 1)}))


if __name__ == "__main__":
    main()
