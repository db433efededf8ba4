"""Per-program XLA compiler-option presets for the jitted train steps.

XLA_FLAGS env vars never reach the server-side TPU compiler through the axon
tunnel, but per-program `compiler_options` travel inside the compile request
and do (and on directly-attached TPU-VMs they work identically). The presets
here were A/B-measured with tools/bench_xla_opts.py on the complete jitted
stage-1/2 train steps (chained-marginal methodology, docs/BENCHMARKS.md):
enabling all experimental latency-hiding-scheduler features collapses part of
the VMEM-prefetch copy-stall slice that dominates the non-GEMM step time.

The options are TPU-compiler flags: `resolve_xla_opts` returns None on any
other backend (CPU tests, the driver's virtual-device dryrun) so the same
config runs everywhere.

OUTCOME (r3, final): every preset measured NEUTRAL or negative once the
benchmark harness was hardened against two-sided marginal-timing noise
(utils/benching.py docstring) — the initially-adopted "allsched +12%" did not
reproduce back-to-back (11.048 vs 11.069 ms). Both stage defaults are "none";
the plumbing stays because per-program compiler_options are the ONLY way to
reach the server-side TPU compiler through the axon tunnel, and the presets
remain selectable for A/B on other TPU generations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

# Measured on v5e (B=32 stage-1 BERT step), robust back-to-back methodology:
# "allsched" 11.048 vs 11.069 ms base — NEUTRAL (the earlier 9.91-vs-11.12
# reading was marginal noise). Scoped-VMEM raises (65536/98304 KiB) are
# clearly negative (14.6/11.6 ms); everything else neutral; full table in
# docs/BENCHMARKS.md.
PRESETS: Dict[str, Dict[str, Any]] = {
    "none": {},
    "allsched": {"xla_tpu_enable_all_experimental_scheduler_features": True},
    # kept selectable for A/B despite losing to plain allsched on stage-1
    "allsched_rerun": {
        "xla_tpu_enable_all_experimental_scheduler_features": True,
        "xla_latency_hiding_scheduler_rerun": 2,
    },
}


def resolve_xla_opts(preset: str,
                     backend: Optional[str] = None) -> Optional[Dict]:
    """Map a config `xla_opts` preset name to jax.jit compiler_options.

    Returns None (= compiler defaults) for the "none" preset or when the
    active backend is not TPU — the flags are TPU-compiler options and other
    backends reject unknown option names.
    """
    if preset not in PRESETS:
        raise ValueError(
            f"unknown xla_opts preset {preset!r}; choose from "
            f"{sorted(PRESETS)}")
    opts = PRESETS[preset]
    if not opts:
        return None
    if (backend or jax.default_backend()) != "tpu":
        return None
    return dict(opts)
