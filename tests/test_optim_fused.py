"""Fused (flattened per-group) optimizer == multi_transform, value-for-value.

The fused path (engine/optim.make_partitioned_flat_tx) exists purely for TPU
step-time (the per-leaf Adam chain is ~2k tiny ops in the profiled stage-1
step); Adam/SGD updates are elementwise so flattening must not change any
value beyond fp-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import optim


def _tree(seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 8)
    return {
        "image_head": {"proj": {"kernel": jax.random.normal(k[0], (16, 8)),
                                "bias": jnp.zeros((8,))}},
        "text_encoder": {"l0": {"w": jax.random.normal(k[1], (8, 8))},
                         "l1": {"w": jax.random.normal(k[2], (8, 4))}},
        "text_head": {"w": jax.random.normal(k[3], (4, 4))},
        "image_cls": {"weight": jax.random.normal(k[4], (10, 8))},
        "text_cls": {"weight": jax.random.normal(k[5], (10, 8))},
    }


def _run_steps(tx, params, n=3, lr_groups=("head", "encoder", "cls")):
    state = tx.init(params)
    for g in lr_groups:
        state = optim.set_lr(state, g, 0.01 * (1 + hash(g) % 3))
    for i in range(n):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p + 0.1 * i) * 0.05, params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


@pytest.mark.parametrize("maker", [optim.make_stage1_bert_tx,
                                   optim.make_stage1_lstm_tx])
def test_fused_matches_multi_transform_stage1(maker):
    params = _tree()
    base = TGFRConfig().replace(weight_decay=0.02)
    p_ref, _ = _run_steps(maker(base), params)
    p_fused, st = _run_steps(maker(base.replace(fused_optimizer=True)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p_ref, p_fused)
    # fused state round-trips LR edits
    assert abs(optim.get_lr(st, "head") - 0.01 * (1 + hash("head") % 3)) < 1e-9


def test_fused_matches_multi_transform_stage2():
    params = {
        "text_encoder": {"l0": {"w": jnp.ones((4, 4)) * 0.3}},
        "text_head": {"w": jnp.ones((4, 2)) * 0.2},
        "image_head": {"w": jnp.ones((2, 2)) * 0.1},
        "fusion_net": {"w": jnp.ones((2, 2)) * 0.5},
        "metric_fc": {"weight": jnp.ones((6, 2))},
    }
    base = TGFRConfig().replace(weight_decay=0.01)
    p_ref, _ = _run_steps(optim.make_stage2_tx(base), params)
    p_fused, _ = _run_steps(optim.make_stage2_tx(
        base.replace(fused_optimizer=True)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p_ref, p_fused)


def test_fused_frozen_text_group_stays_frozen():
    params = _tree()
    args = TGFRConfig().replace(compat_frozen_text=True, fused_optimizer=True)
    tx = optim.make_stage1_bert_tx(args)
    state = tx.init(params)
    state = optim.set_lr(state, "encoder", 99.0)  # must no-op, not crash
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = tx.update(grads, state, params)
    for leaf in jax.tree_util.tree_leaves(updates["text_encoder"]):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
