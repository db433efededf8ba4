"""Trustworthy on-device step timing (single-dispatch chained loops).

Implementation note: the chain is a `jax.lax.while_loop` with a DYNAMIC trip
count (not a fixed-length `lax.scan`) so ONE compiled program serves every k
— each fresh compile of the full train step through the tunnel costs 5-25
minutes. The timing properties are identical to a scan chain: iterations
carry a true data dependence and execute sequentially on device.

Why this exists — measured on this project's TPU tunnel (axon), and the
reason every benchmark in this repo uses it:

  * A Python loop of N async dispatches with one `block_until_ready` at the
    end UNDER-reports chained train steps by ~5x here: `block_until_ready`
    through the tunnel can return before the chained executions have actually
    retired (verified: a 50-step loop "measured" 2.65 ms/step for a program
    whose FLOP count alone needs >3 ms at hardware peak; the same program
    chain-measured at 14.2 ms/step, which matches an independent
    per-component decomposition).
  * A synchronous loop (fetch per step) measures RPC pacing (~15 ms/dispatch),
    not compute.

The reliable pattern: compile ONE program that runs the step k times in a
chained device loop (true data dependence between iterations), block on its
outputs,
and take the MARGINAL cost between two k values — this cancels the fixed
dispatch/readiness overhead (~45 ms here) exactly:

    ms_per_step = (t(k_big) - t(k_small)) / (k_big - k_small)

This is also sound on directly-attached TPUs (scan adds no per-step overhead),
so the same bench code reports honest numbers on real TPU-VM hosts.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["chain_steps", "time_chained_steps", "time_chained_forward"]


def chain_steps(inner: Callable[[Any, jax.Array], Tuple[Any, jnp.ndarray]],
                donate: bool = True,
                compiler_options: dict | None = None):
    """Compile `inner(state, rng_key) -> (state, scalar)` into
    `run(state, key, k)` executing k chained iterations in one dispatch.

    k is a DYNAMIC (traced) trip count — one compiled program serves every k,
    which matters here because each compile of the full train step through the
    tunnel takes 10-25 minutes. Iterations keep a true data dependence (state
    threads through the loop), so executions cannot be elided; the final
    scalar is returned as the thing to block on.

    compiler_options: optional per-program XLA options (e.g.
    {"xla_tpu_scoped_vmem_limit_kib": "65536"}). These travel INSIDE the
    compile request, so they reach the server-side TPU compiler even through
    the axon tunnel where XLA_FLAGS env vars do not (tools/bench_xla_opts.py
    A/Bs them). When set, the program is AOT-compiled on first call for the
    given arg shapes."""

    jitted = jax.jit(lambda state, key, k: _chain_body(inner, state, key, k),
                     donate_argnums=(0,) if donate else ())
    if not compiler_options:
        return jitted

    cache = {}

    def run(state, key, k):
        leaves, treedef = jax.tree_util.tree_flatten((state, key))
        shapes = (treedef, tuple((l.shape, str(l.dtype)) for l in leaves))
        compiled = cache.get(shapes)
        if compiled is None:
            compiled = jitted.lower(state, key, jnp.int32(0)).compile(
                compiler_options=dict(compiler_options))
            cache[shapes] = compiled
        return compiled(state, key, jnp.int32(k))

    return run


def _chain_body(inner, state, key, k):
    def cond(c):
        return c[0] < k

    def body(c):
        i, st, ky, _ = c
        ky, sub = jax.random.split(ky)
        st, scalar = inner(st, sub)
        return (i + 1, st, ky,
                jnp.asarray(scalar, jnp.float32).reshape(()))

    init = (jnp.int32(0), state, key, jnp.float32(0))
    _, st, _, last = jax.lax.while_loop(cond, body, init)
    return st, last


def time_chained_steps(inner, state, key,
                       ks: Sequence[int] = (4, 44),
                       donate: bool = True, repeats: int = 5,
                       compiler_options: dict | None = None) -> float:
    """True per-step milliseconds of `inner` (see module docstring).

    Compiles ONE dynamic-trip-count program (persistent-cached), warms it,
    runs each k `repeats` times keeping the MEDIAN total, and returns the
    marginal per-step cost between the two k values.

    NOISE WARNING (r3, measured): the MARGINAL of two noisy totals is
    TWO-sided — a slow-biased t(k_small) plus a fast-biased t(k_big)
    UNDER-reports the step. With the old defaults (ks=(4,24), repeats=2,
    min) the same cached stage-1 program measured anywhere in 9.9-11.2 ms
    across runs (±6%), which briefly "adopted" a neutral compiler flag as
    +12%. Defenses now: a wide k spread (marginal noise scales ~1/Δk; k is
    a dynamic trip count so no recompile), more repeats, and the MEDIAN
    rather than the min — this tunnel's documented artifact is EARLY
    readiness resolution (fast outliers), exactly what a min would select.
    Adoption-grade A/Bs should also run variants back-to-back in ONE
    process and treat <5% deltas as noise.
    """
    assert len(ks) == 2 and ks[1] > ks[0]
    run = chain_steps(inner, donate=donate, compiler_options=compiler_options)
    state, last = run(state, key, ks[0])             # compile + warm
    float(last)
    totals = []
    for k in ks:
        samples = []
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            state, last = run(state, key, k)
            # VALUE fetch, not block_until_ready: through the tunnel,
            # readiness can resolve before a chained execution retires
            # (observed as a degenerate ~0 marginal); a device->host read
            # of the final scalar cannot.
            float(last)
            samples.append(time.perf_counter() - t0)
        samples.sort()
        totals.append(samples[len(samples) // 2])
    return (totals[1] - totals[0]) / (ks[1] - ks[0]) * 1000.0


def time_chained_forward(fwd: Callable[..., Any], args: Tuple,
                         ks: Sequence[int] = (4, 44),
                         repeats: int = 5) -> float:
    """Per-call milliseconds of a pure forward `fwd(*args)`.

    Iterations are chained by feeding a tiny function of the previous output
    back into the first (float) argument — a real data dependence, so XLA
    cannot hoist the loop-invariant body out of the scan (it would with a
    constant input) and the tunnel cannot elide intermediate executions.
    The perturbation scale (1e-37) is far below float32's representable
    effect on normalized inputs.
    """
    assert len(ks) == 2 and ks[1] > ks[0]
    first, rest = args[0], args[1:]

    def leaf_sum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree))

    @jax.jit
    def run(x0, rest, k):
        def cond(c):
            return c[0] < k
        def body(c):
            i, x, _ = c
            out = fwd(x, *rest)
            s = leaf_sum(out)
            x = x + (s * 1e-37).astype(x.dtype)
            return (i + 1, x, s)
        _, _, s = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), x0, jnp.float32(0)))
        return s

    s = run(first, rest, ks[0])                      # compile + warm
    float(s)
    totals = []
    for k in ks:
        samples = []
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            s = run(first, rest, k)
            float(s)  # VALUE fetch — see time_chained_steps
            samples.append(time.perf_counter() - t0)
        samples.sort()
        totals.append(samples[len(samples) // 2])
    return (totals[1] - totals[0]) / (ks[1] - ks[0]) * 1000.0
