"""End-to-end engine tests on the 8-device virtual CPU mesh: a stage-1 LSTM
train step (loss decreases, params update, state donated), a stage-2 fusion
step, checkpoint round-trip, and the multi-device sharded step."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu.config import TGFRConfig


def _tiny_args(**kw):
    base = dict(
        en_type="LSTM", synthetic=True, batch_size=4, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=0,
        is_DAMSM=True, is_CLIP=True, is_ident_loss=True, is_CMP=False)
    base.update(kw)
    return TGFRConfig().replace(**base)


@pytest.fixture(scope="module")
def lstm_trainer():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    return Stage1Trainer(_tiny_args())


def test_stage1_step_updates_params_and_loss_finite(lstm_trainer):
    tr = lstm_trainer
    batch = next(iter(tr.train_dl))
    batch = {k: v for k, v in batch.items() if k != "key"}
    before = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params["image_head"])[0]).copy()
    state, metrics = tr._train_step(tr.state, batch, tr.backbone.variables,
                                    jax.random.PRNGKey(0))
    tr.state = state
    assert np.isfinite(float(metrics["total_loss"]))
    after = np.asarray(
        jax.tree_util.tree_leaves(state.params["image_head"])[0])
    assert not np.allclose(before, after)  # heads actually trained
    # text encoder trains by default (deviation #2)
    g = jax.tree_util.tree_leaves(state.params["text_encoder"])[0]
    assert np.all(np.isfinite(np.asarray(g)))


def test_stage1_lr_schedule(lstm_trainer):
    from text_guided_face_recognition_tpu.engine import optim
    tr = lstm_trainer
    tr.lr = {"head": 0.002, "encoder": 0.001, "cls": 0.1}
    tr._apply_lrs()
    tr.schedule_epoch_end(3)  # epoch 3: cls /10, adams *0.98
    assert optim.get_lr(tr.state.opt_state, "cls") == pytest.approx(0.01)
    assert optim.get_lr(tr.state.opt_state, "head") == pytest.approx(
        0.002 * 0.98)
    assert optim.get_lr(tr.state.opt_state, "encoder") == pytest.approx(
        0.001 * 0.98)


def test_stage1_compat_frozen_text_keeps_encoder_fixed():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    tr = Stage1Trainer(_tiny_args(compat_frozen_text=True))
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    before = jax.tree_util.tree_map(np.asarray,
                                    tr.state.params["text_encoder"])
    state, _ = tr._train_step(tr.state, batch, tr.backbone.variables,
                              jax.random.PRNGKey(0))
    after = state.params["text_encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_allclose(a, np.asarray(b))


def test_stage1_multidevice_sharded_step():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = jax.device_count()
    assert n == 8
    tr = Stage1Trainer(_tiny_args(batch_size=2 * n, num_devices=n))
    mesh = make_mesh(n)
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    state = jax.device_put(tr.state, NamedSharding(mesh, P()))
    frozen = jax.device_put(tr.backbone.variables, NamedSharding(mesh, P()))
    new_state, metrics = tr._train_step(state, batch, frozen,
                                        jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_stage2_fusion_step_and_checkpoint_roundtrip(tmp_path):
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    from text_guided_face_recognition_tpu.engine.checkpoint import (
        load_checkpoint, save_checkpoint)

    args = _tiny_args(fusion_type="linear", CONFIG_NAME="Fusion",
                      lr_image_train=0.1, loss="focal_loss",
                      checkpoints_path=str(tmp_path))
    tr = FusionTrainer(args)
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    state, metrics = tr._train_step(tr.state, batch, tr.backbone.variables,
                                    jax.random.PRNGKey(0))
    tr.state = state
    assert np.isfinite(float(metrics["loss"]))

    tr.save_models(str(tmp_path), epoch=1)
    path = f"{tmp_path}/fusion_linear_arcface_1"
    like = {"net": {"params": tr.state.params["fusion_net"]},
            "image_head": {"params": tr.state.params["image_head"],
                           "batch_stats": tr.state.batch_stats["image_head"]}}
    tree = load_checkpoint(path, like=like)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(tree["net"]["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            tr.state.params["fusion_net"])[0]))


def test_cross_backend_raw_restore_fallback(tmp_path, monkeypatch):
    """Target-less restores must survive checkpoints written on another
    backend: orbax replays the stored per-leaf device sharding and raises
    ValueError("Device ... was not found") when that device doesn't exist
    in this runtime (a TPU-written checkpoint restored on CPU). _raw_restore
    falls back to an abstract target rebuilt from the stored metadata with a
    local sharding — simulate the foreign-device failure by making the
    target-less call raise."""
    import orbax.checkpoint as ocp

    from text_guided_face_recognition_tpu.engine.checkpoint import (
        load_checkpoint, save_checkpoint)

    tree = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "b": {"v": np.full(4, 7, np.int32)}}
    path = save_checkpoint(str(tmp_path / "ck"), tree)

    orig = ocp.StandardCheckpointer.restore

    def foreign_device_restore(self, directory, *a, **kw):
        if not a and kw.get("target") is None:
            raise ValueError(
                "Device TPU v5 lite0 was not found in jax.local_devices().")
        return orig(self, directory, *a, **kw)

    monkeypatch.setattr(ocp.StandardCheckpointer, "restore",
                        foreign_device_restore)
    out = load_checkpoint(path)  # like=None -> raw restore -> fallback
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), tree["a"]["w"])
    np.testing.assert_array_equal(np.asarray(out["b"]["v"]), tree["b"]["v"])
    # the partial path raw-restores too
    part = load_checkpoint(
        path, like={"a": {"w": np.zeros((2, 3), np.float32)}}, partial=True)
    np.testing.assert_array_equal(np.asarray(part["a"]["w"]), tree["a"]["w"])


def test_stage1_bert_step_full_cocktail():
    """BERT path (groupvit arch) with dropout + DAMSM/CLIP/ident losses."""
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    args = _tiny_args(en_type="BERT", bert_type="groupvit", bert_words_num=12)
    tr = Stage1Trainer(args)
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    before = {name: np.asarray(
        jax.tree_util.tree_leaves(tr.state.params[name])[0]).copy()
        for name in ("text_encoder", "text_head")}
    state, metrics = tr._train_step(tr.state, batch, tr.backbone.variables,
                                    jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    for k in ("w_loss", "s_loss", "clip_loss", "idn_loss"):
        assert np.isfinite(float(metrics[k])), k
    # text encoder + text head both update (deviation #2 default)
    for name in ("text_encoder", "text_head"):
        b = jax.tree_util.tree_leaves(state.params[name])[0]
        assert not np.allclose(before[name], np.asarray(b)), name


def test_stage1_adaface_backbone_path():
    """model_type=adaface: (global, local, norm) backbone contract + BGR data
    path through a full train step."""
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    tr = Stage1Trainer(_tiny_args(model_type="adaface"))
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    state, metrics = tr._train_step(tr.state, batch, tr.backbone.variables,
                                    jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_stage1_magface_backbone_path():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    tr = Stage1Trainer(_tiny_args(model_type="magface"))
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    _, metrics = tr._train_step(tr.state, batch, tr.backbone.variables,
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_stage1_gru_encoder_path():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    tr = Stage1Trainer(_tiny_args(en_type="GRU"))
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    state, metrics = tr._train_step(tr.state, batch, tr.backbone.variables,
                                    jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_multiaxis_mesh_dcn_ready(lstm_trainer):
    """('replica', 'data') mesh: batch sharded on 'data', replicated on
    'replica' — the DCN-ready layout executes the unchanged train step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from text_guided_face_recognition_tpu.parallel import make_mesh

    mesh = make_mesh(0, axis_names=("replica", "data"))
    assert dict(mesh.shape) == {"replica": 1, "data": 8}
    tr = lstm_trainer
    # tile the tiny fixture batch to a shardable size (8 rows over data=8)
    batch = {k: jax.device_put(np.concatenate([v, v]),
                               NamedSharding(mesh, P("data")))
             for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    state = jax.device_put(
        jax.tree_util.tree_map(jnp.copy, tr.state), NamedSharding(mesh, P()))
    frozen = jax.device_put(tr.backbone.variables, NamedSharding(mesh, P()))
    _, metrics = tr._train_step(state, batch, frozen, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_stage1_save_state_resume_roundtrip(lstm_trainer, tmp_path):
    tr = lstm_trainer
    tr.lr = {"head": 0.002, "encoder": 0.001, "cls": 0.05}
    tr._apply_lrs()
    tr.save_state(str(tmp_path), epoch=7)

    want = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params["image_head"])[0]).copy()
    # perturb live state, then resume
    tr.lr = {"head": 1.0, "encoder": 1.0, "cls": 1.0}
    tr._apply_lrs()
    tr.resume_from(str(tmp_path / "train_state_7"))
    assert tr.start_epoch == 8
    assert tr.lr["cls"] == pytest.approx(0.05)
    got = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params["image_head"])[0])
    np.testing.assert_allclose(got, want)


def test_validate_concat_produces_scores(lstm_trainer, capsys):
    m = lstm_trainer.validate()
    assert 0.0 <= m["auc"] <= 1.0
    out = capsys.readouterr().out
    assert "AUC" in out and "EER" in out
