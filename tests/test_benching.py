"""Scan-chained benchmarking helper (utils/benching.py).

The helper exists because multi-dispatch async timing through the TPU tunnel
is unreliable (see the module docstring); these tests pin the semantics that
make the scan measurement trustworthy: k true chained executions per
dispatch, and a real data dependence in the forward variant.
"""

import jax
import jax.numpy as jnp
import numpy as np

from text_guided_face_recognition_tpu.utils.benching import (
    chain_steps,
    time_chained_forward,
    time_chained_steps,
)


def test_chain_steps_executes_k_chained_iterations():
    def inner(state, key):
        # state must thread through iterations; key must differ per step
        bump = jax.random.uniform(key, ())
        return state + 1.0, state + bump

    run = chain_steps(inner, donate=False)
    state, last = run(jnp.float32(0), jax.random.PRNGKey(0), 5)
    assert float(state) == 5.0          # k iterations really ran
    assert last.shape == ()
    assert 4.0 <= float(last) < 5.0     # last scalar saw the threaded state
    # dynamic trip count: SAME compiled program serves a different k
    state2, _ = run(jnp.float32(0), jax.random.PRNGKey(0), 9)
    assert float(state2) == 9.0
    # rng keys differ step to step -> different bumps for k=1-shifted starts
    _, l1 = run(jnp.float32(0), jax.random.PRNGKey(0), 1)
    _, l2 = run(jnp.float32(0), jax.random.PRNGKey(1), 1)
    assert float(l1) != float(l2)


def test_time_chained_steps_returns_positive_marginal_ms():
    def inner(state, key):
        state = state @ state * 1e-3 + 1e-3
        return state, jnp.sum(state)

    # The marginal of a ~us-scale program can go non-positive when the host
    # is contended (another bench hogging the single core); retry a couple
    # of times before declaring the harness broken.
    for attempt in range(3):
        ms = time_chained_steps(inner, jnp.eye(256, dtype=jnp.float32),
                                jax.random.PRNGKey(0), ks=(2, 16),
                                donate=False, repeats=3)
        if ms > 0:
            break
    assert ms > 0


def test_time_chained_forward_positive_and_dependence_kept():
    calls = {"traces": 0}

    def fwd(x, w):
        calls["traces"] += 1
        return (x @ w) @ w * 1e-3

    w = jnp.ones((256, 256), jnp.float32) * 1e-2
    ms = time_chained_forward(fwd, (jnp.ones((256, 256), jnp.float32), w),
                              ks=(2, 16), repeats=3)
    assert ms > 0
    # traced inside scan once per k-program, not once per iteration
    assert calls["traces"] <= 4


def test_chain_steps_compiler_options_path():
    """compiler_options routes through AOT lower().compile() — same
    semantics as the plain jit path, keyed on arg shapes so a shape change
    recompiles instead of reusing a stale executable."""
    def inner(state, key):
        return state + 1.0, jnp.sum(state)

    run = chain_steps(inner, donate=False,
                      compiler_options={"xla_embed_ir_in_executable": False})
    st, _ = run(jnp.zeros((4,)), jax.random.PRNGKey(0), 5)
    assert float(st[0]) == 5.0
    st8, _ = run(jnp.zeros((8,)), jax.random.PRNGKey(0), 3)
    assert st8.shape == (8,) and float(st8[0]) == 3.0
