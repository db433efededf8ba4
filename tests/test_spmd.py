"""Explicit shard_map SPMD step validation.

1-device mesh: bitwise-equivalent to the jit step (collectives are identities)
— proves the explicit all-gather/psum formulation computes the same program.
8-device mesh: executes, stays finite, and agrees with the jit step up to the
expected per-replica-vs-global BatchNorm statistics difference (the shard_map
path normalizes with per-shard batch stats — the reference DataParallel
behavior; the jit path uses global-batch stats — docs/DEVIATIONS.md #6)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.parallel import make_mesh
from text_guided_face_recognition_tpu.parallel.spmd import (
    make_shardmap_train_step,
)


@pytest.fixture(scope="module")
def trainer():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    args = TGFRConfig().replace(
        en_type="LSTM", synthetic=True, batch_size=16, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=0,
        # deterministic text path for exact jit-vs-shardmap comparison
        compat_frozen_text=True)
    return Stage1Trainer(args)


@pytest.fixture(scope="module")
def batch(trainer):
    return {k: v for k, v in next(iter(trainer.train_dl)).items()
            if k != "key"}


def test_shardmap_1device_bitwise_matches_jit(trainer, batch):
    mesh = make_mesh(1)
    rng = jax.random.PRNGKey(0)
    frozen = trainer.backbone.variables

    # the spmd step folds the shard index into the dropout key; shard 0 of a
    # 1-device mesh therefore sees fold_in(rng, 0)
    jit_state, jit_metrics = trainer._train_step(
        jax.tree_util.tree_map(jnp.copy, trainer.state), batch, frozen,
        jax.random.fold_in(rng, 0))
    spmd_step = make_shardmap_train_step(trainer, mesh)
    spmd_state, spmd_metrics = spmd_step(
        jax.tree_util.tree_map(jnp.copy, trainer.state), batch, frozen, rng)

    for k in jit_metrics:
        assert float(spmd_metrics[k]) == pytest.approx(
            float(jit_metrics[k]), rel=1e-5), k
    for name in ("image_head", "image_cls", "text_cls"):
        for a, b in zip(jax.tree_util.tree_leaves(jit_state.params[name]),
                        jax.tree_util.tree_leaves(spmd_state.params[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_shardmap_8device_runs_and_agrees_modulo_bn(trainer, batch):
    mesh = make_mesh(8)
    rng = jax.random.PRNGKey(0)
    frozen = trainer.backbone.variables

    jit_state, jit_metrics = trainer._train_step(
        jax.tree_util.tree_map(jnp.copy, trainer.state), batch, frozen, rng)
    spmd_step = make_shardmap_train_step(trainer, mesh)
    spmd_state, spmd_metrics = spmd_step(
        jax.tree_util.tree_map(jnp.copy, trainer.state), batch, frozen, rng)

    for k in jit_metrics:
        v = float(spmd_metrics[k])
        assert np.isfinite(v)
        # per-replica BN stats perturb activations slightly; the losses must
        # still agree closely on the identical global negative set
        assert v == pytest.approx(float(jit_metrics[k]), rel=0.05), k

    # image-side params are dropout-free: their updates see identical
    # (gathered) embeddings up to the BN-statistics perturbation. (The text
    # side also samples different dropout masks per formulation, so it is
    # excluded from the numeric comparison.)
    for a, b in zip(jax.tree_util.tree_leaves(jit_state.params["image_cls"]),
                    jax.tree_util.tree_leaves(spmd_state.params["image_cls"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.2, atol=2e-4)


def test_shardmap_fusion_step_matches_jit_1device():
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    from text_guided_face_recognition_tpu.parallel.spmd import (
        make_shardmap_fusion_step)

    args = TGFRConfig().replace(
        en_type="LSTM", synthetic=True, batch_size=8, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=0,
        fusion_type="linear", CONFIG_NAME="Fusion",
        compat_frozen_text=True)
    tr = FusionTrainer(args)
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    rng = jax.random.PRNGKey(0)
    frozen = tr.backbone.variables

    jit_state, jit_m = tr._train_step(
        jax.tree_util.tree_map(jnp.copy, tr.state), batch, frozen,
        jax.random.fold_in(rng, 0))
    step = make_shardmap_fusion_step(tr, make_mesh(1))
    spmd_state, spmd_m = step(
        jax.tree_util.tree_map(jnp.copy, tr.state), batch, frozen, rng)
    assert float(spmd_m["loss"]) == pytest.approx(float(jit_m["loss"]),
                                                  rel=1e-5)
    for a, b in zip(
            jax.tree_util.tree_leaves(jit_state.params["fusion_net"]),
            jax.tree_util.tree_leaves(spmd_state.params["fusion_net"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # and it executes on the full 8-device mesh
    step8 = make_shardmap_fusion_step(tr, make_mesh(8))
    _, m8 = step8(jax.tree_util.tree_map(jnp.copy, tr.state), batch, frozen,
                  rng)
    assert np.isfinite(float(m8["loss"]))
