"""Resume migration for legacy optimizer-state checkpoints (DEVIATIONS #21).

r1/r2 train_state artifacts hold per-leaf optax.multi_transform optimizer
state with fp32 Adam moments (grad clip on by default in r2); the r3
defaults changed the tree to the stacked-bucket layout with bf16 moments.
engine/checkpoint.load_train_state must restore the old artifacts under the
new defaults, carrying LRs, step counts, Adam moments, and SGD traces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import optim
from text_guided_face_recognition_tpu.engine.checkpoint import (
    load_train_state, save_checkpoint)


def _tree(seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 8)
    return {
        "image_head": {"proj": {"kernel": jax.random.normal(k[0], (16, 8)),
                                "bias": jnp.zeros((8,))}},
        "text_encoder": {"l0": {"w": jax.random.normal(k[1], (8, 8))},
                         "l1": {"w": jax.random.normal(k[2], (8, 8))}},
        "text_head": {"w": jax.random.normal(k[3], (4, 4))},
        "image_cls": {"weight": jax.random.normal(k[4], (10, 8))},
        "text_cls": {"weight": jax.random.normal(k[5], (10, 8))},
    }


R2_KNOBS = dict(stacked_optimizer=False, fused_optimizer=False,
                adam_moments_dtype="float32", apply_grad_clip=True)
LRS = {"head": 0.002, "encoder": 4e-5, "cls": 0.05}


def _legacy_state_after_steps(maker, args, params, n=3):
    tx = maker(args)
    state = tx.init(params)
    for g, lr in LRS.items():
        state = optim.set_lr(state, g, lr)
    for i in range(n):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p + 0.1 * i) * 0.05, params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


def _save_train_state(tmp_path, params, opt_state, epoch=7):
    path = str(tmp_path / "train_state_7")
    save_checkpoint(path, {
        "params": params,
        "batch_stats": {},
        "opt_state": opt_state,
        "meta": {"epoch": jnp.asarray(epoch),
                 "lr": {k: jnp.asarray(v) for k, v in LRS.items()}},
    })
    return path


@pytest.mark.parametrize("maker", [optim.make_stage1_bert_tx,
                                   optim.make_stage1_lstm_tx])
def test_r2_opt_state_restores_under_r3_defaults(tmp_path, maker):
    params0 = _tree()
    legacy_args = TGFRConfig().replace(weight_decay=0.02, **R2_KNOBS)
    params, legacy_state = _legacy_state_after_steps(maker, legacy_args,
                                                     params0)
    path = _save_train_state(tmp_path, params, legacy_state)

    # resume under the r3 defaults: stacked-small buckets + bf16 moments
    args = TGFRConfig().replace(weight_decay=0.02)
    assert args.stacked_optimizer and args.adam_moments_dtype == "bfloat16"
    tx = maker(args)
    fresh = tx.init(params)
    like = {"params": params, "batch_stats": {}, "opt_state": fresh,
            "meta": {"epoch": jnp.asarray(0),
                     "lr": {k: jnp.asarray(0.0) for k in LRS}}}
    tree = load_train_state(path, like, args, maker, params,
                            optim._stage1_group)

    migrated = tree["opt_state"]
    # LRs and counts carried over
    for g, lr in LRS.items():
        assert optim.get_lr(migrated, g) == pytest.approx(lr)
    adamstates = []
    optim._walk_states(migrated, "ScaleByAdamState", adamstates)
    assert adamstates and all(int(s.count) == 3 for s in adamstates)

    # the migrated state must continue the LEGACY trajectory: next-step
    # updates match the un-migrated continuation to bf16-moment rounding
    grads = jax.tree_util.tree_map(lambda p: jnp.cos(p) * 0.05, params)
    u_new, _ = tx.update(grads, migrated, params)
    u_old, _ = maker(legacy_args).update(grads, legacy_state, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-4),
        u_new, u_old)


def test_current_format_round_trip_unchanged(tmp_path):
    """A checkpoint already in the current format must restore bit-exactly
    (no migration detour)."""
    params = _tree()
    args = TGFRConfig().replace(weight_decay=0.02)
    maker = optim.make_stage1_bert_tx
    _, state = _legacy_state_after_steps(maker, args, params)
    path = _save_train_state(tmp_path, params, state)
    like = {"params": params, "batch_stats": {},
            "opt_state": maker(args).init(params),
            "meta": {"epoch": jnp.asarray(0),
                     "lr": {k: jnp.asarray(0.0) for k in LRS}}}
    tree = load_train_state(path, like, args, maker, params,
                            optim._stage1_group)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        tree["opt_state"], state)


def test_unknown_format_raises_naming_the_knobs(tmp_path):
    """A tree that fits no shipped layout must fail with a diagnosis that
    names the optimizer knobs, not a raw tree_map structure error."""
    params = _tree()
    args = TGFRConfig().replace(weight_decay=0.02)
    maker = optim.make_stage1_bert_tx
    path = str(tmp_path / "train_state_1")
    save_checkpoint(path, {"params": params, "batch_stats": {},
                           "opt_state": {"bogus": jnp.zeros((3,))},
                           "meta": {"epoch": jnp.asarray(1),
                                    "lr": {k: jnp.asarray(v)
                                           for k, v in LRS.items()}}})
    like = {"params": params, "batch_stats": {},
            "opt_state": maker(args).init(params),
            "meta": {"epoch": jnp.asarray(0),
                     "lr": {k: jnp.asarray(0.0) for k in LRS}}}
    with pytest.raises(ValueError, match="stacked_optimizer"):
        load_train_state(path, like, args, maker, params,
                         optim._stage1_group)


@pytest.mark.slow
def test_stage1_trainer_resumes_r2_checkpoint(tmp_path):
    """End-to-end: a Stage1Trainer under r2 optimizer knobs saves its state;
    a trainer under the r3 defaults resumes it and trains a step."""
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer

    base = TGFRConfig().replace(
        en_type="BERT", bert_type="groupvit", synthetic=True, batch_size=4,
        num_workers=0, max_epoch=1, compute_dtype="float32", num_classes=8,
        max_steps=1)
    old = Stage1Trainer(base.replace(**R2_KNOBS))
    old.lr = dict(LRS)
    old._apply_lrs()
    old.save_state(str(tmp_path), epoch=2)

    new = Stage1Trainer(base)
    new.resume_from(str(tmp_path / "train_state_2"))
    assert new.start_epoch == 3
    for g, lr in LRS.items():
        assert optim.get_lr(new.state.opt_state, g) == pytest.approx(lr)
    batch = next(iter(new.train_dl))
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                    if k != "key"}
    state, metrics = new._train_step(new.state, device_batch,
                                     new.backbone.variables,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
