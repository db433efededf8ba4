"""Trustworthy on-device step timing (single-dispatch scan chains).

Why this exists — measured on this project's TPU tunnel (axon), and the
reason every benchmark in this repo uses it:

  * A Python loop of N async dispatches with one `block_until_ready` at the
    end UNDER-reports chained train steps by ~5x here: `block_until_ready`
    through the tunnel can return before the chained executions have actually
    retired (verified: a 50-step loop "measured" 2.65 ms/step for a program
    whose FLOP count alone needs >3 ms at hardware peak; the same program
    scan-chained measures 14.2 ms/step, which matches an independent
    per-component decomposition).
  * A synchronous loop (fetch per step) measures RPC pacing (~15 ms/dispatch),
    not compute.

The reliable pattern: compile ONE program that runs the step k times in a
`lax.scan` (true data dependence between iterations), block on its outputs,
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
                donate: bool = True):
    """Compile `inner(state, rng_key) -> (state, scalar)` into
    `run(state, key, k)` executing k chained iterations in one dispatch."""

    @functools.partial(jax.jit, static_argnums=(2,),
                       donate_argnums=(0,) if donate else ())
    def run(state, key, k: int):
        def body(carry, _):
            st, ky = carry
            ky, sub = jax.random.split(ky)
            st, scalar = inner(st, sub)
            return (st, ky), scalar
        (st, _), scalars = jax.lax.scan(body, (state, key), None, length=k)
        return st, scalars

    return run


def time_chained_steps(inner, state, key,
                       ks: Sequence[int] = (4, 24),
                       donate: bool = True, repeats: int = 2) -> float:
    """True per-step milliseconds of `inner` (see module docstring).

    Compiles one scan program per k (persistent-cached), runs each
    `repeats`+1 times (first run doubles as warmup for that k), keeps the
    MIN total per k (standard timing practice — noise is one-sided), and
    returns the marginal per-step cost between the two k values.
    """
    assert len(ks) == 2 and ks[1] > ks[0]
    run = chain_steps(inner, donate=donate)
    totals = []
    for k in ks:
        state, scalars = run(state, key, k)          # compile + warm
        jax.block_until_ready(scalars)
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            state, scalars = run(state, key, k)
            jax.block_until_ready(scalars)
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    return (totals[1] - totals[0]) / (ks[1] - ks[0]) * 1000.0


def time_chained_forward(fwd: Callable[..., Any], args: Tuple,
                         ks: Sequence[int] = (4, 24),
                         repeats: int = 2) -> float:
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

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(x0, rest, k: int):
        def body(carry, _):
            x, prev = carry
            out = fwd(x, *rest)
            s = leaf_sum(out)
            x = x + (s * 1e-37).astype(x.dtype)
            return (x, s), s
        (_, _), ss = jax.lax.scan(body, (x0, jnp.float32(0)), None, length=k)
        return ss

    totals = []
    for k in ks:
        ss = run(first, rest, k)
        jax.block_until_ready(ss)
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            ss = run(first, rest, k)
            jax.block_until_ready(ss)
            best = min(best, time.perf_counter() - t0)
        totals.append(best)
    return (totals[1] - totals[0]) / (ks[1] - ks[0]) * 1000.0
