"""Semantics of the one-RNG-call dropout plan (models/text_bert._DropPlan).

Mask VALUES are PRNG-implementation-defined (torch masks differ too —
DEVIATIONS #18); what must hold: keep probability, inverted scaling,
eval-mode equivalence, and that the fused path changes no parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np

from text_guided_face_recognition_tpu.models.text_bert import (
    TextArch, TransformerEncoder, _DropPlan)

ARCH = TextArch(vocab_size=100, hidden=128, layers=2, heads=4,
                intermediate=256, max_positions=64, dropout=0.1)


def _data(b=8, t=16):
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 99, (b, t)),
                      jnp.int32)
    return ids, jnp.ones((b, t), jnp.int32)


def test_drop_plan_keep_probability_and_scaling():
    rate = 0.1
    n = 200_000
    bits = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
    plan = _DropPlan(bits, rate)
    x = jnp.ones((n,), jnp.float32)
    y = np.asarray(plan.take(x))
    kept = y != 0.0
    # kept values carry the inverted-dropout scale exactly
    np.testing.assert_allclose(y[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    assert abs(kept.mean() - (1.0 - rate)) < 5e-3
    assert plan.ofs == n  # consumed exactly its slice


def test_drop_plan_sites_get_disjoint_bits():
    bits = jax.random.bits(jax.random.PRNGKey(1), (64,), jnp.uint32)
    plan = _DropPlan(bits, 0.5)
    a = plan.take(jnp.ones((32,)))
    b = plan.take(jnp.ones((32,)))
    assert plan.ofs == 64
    # same input, different bit slices -> masks differ (0.5 rate, 32 elems)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_dropout_param_tree_and_eval_identical():
    ids, mask = _data()
    ref = TransformerEncoder(ARCH, fused_dropout=False)
    fus = TransformerEncoder(ARCH, fused_dropout=True)
    v_ref = ref.init(jax.random.PRNGKey(0), ids, mask)
    v_fus = fus.init(jax.random.PRNGKey(0), ids, mask)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fus))
    # deterministic (eval) mode: the plan is bypassed entirely
    np.testing.assert_array_equal(
        np.asarray(ref.apply(v_ref, ids, mask, deterministic=True)),
        np.asarray(fus.apply(v_ref, ids, mask, deterministic=True)))


def test_fused_dropout_train_mode_runs_and_drops():
    ids, mask = _data()
    fus = TransformerEncoder(ARCH, fused_dropout=True)
    v = fus.init(jax.random.PRNGKey(0), ids, mask)
    out = fus.apply(v, ids, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # different dropout keys -> different outputs (masks actually applied)
    out2 = fus.apply(v, ids, mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(out, np.float32),
                           np.asarray(out2, np.float32))
