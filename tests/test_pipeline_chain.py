"""Full two-stage pipeline integration: stage-1 trains and saves its
two-artifact checkpoints; stage-2 LOADS them, trains, and saves its own;
the eval layer LOADS stage-2's artifacts and produces scores — the checkpoint
hand-off the reference performs across its three entry points
(src/train_encoders_*.py -> src/fusion_*.py -> src/test.py)."""

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np
import pytest

import jax

from text_guided_face_recognition_tpu.config import TGFRConfig


def _args(tmp, **kw):
    base = dict(
        en_type="LSTM", synthetic=True, batch_size=4, num_workers=2,
        max_epoch=1, max_steps=2, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=0,
        checkpoints_path=str(tmp), fusion_type="linear",
        fusion_final_dim=640, save_interval=1, test_interval=99,
        lambda_clip=1.0, do_test=False)
    base.update(kw)
    return TGFRConfig().replace(**base)


def test_two_stage_checkpoint_handoff(tmp_path):
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    from text_guided_face_recognition_tpu.engine import prepare as prep
    from text_guided_face_recognition_tpu.engine.evaluate import run_test

    # ---- stage 1: train 2 steps, save the two-artifact checkpoints
    a1 = _args(tmp_path, CONFIG_NAME="Train")
    tr1 = Stage1Trainer(a1)
    tr1.train_epoch(1)
    s1_dir = str(tmp_path / "s1")
    tr1.save_encoders(s1_dir, epoch=1)
    text_ckpt = f"{s1_dir}/LSTM_text_encoder_1"
    image_ckpt = f"{s1_dir}/arcface_image_encoder_1"
    assert os.path.isdir(text_ckpt) and os.path.isdir(image_ckpt)
    s1_text_leaf = np.asarray(jax.tree_util.tree_leaves(
        tr1.state.params["text_encoder"])[0])

    # ---- stage 2: must LOAD stage-1 weights (not random init)
    a2 = _args(tmp_path, CONFIG_NAME="Fusion",
               text_encoder_path=text_ckpt, image_encoder_path=image_ckpt)
    tr2 = FusionTrainer(a2)
    loaded_leaf = np.asarray(jax.tree_util.tree_leaves(
        tr2.state.params["text_encoder"])[0])
    np.testing.assert_allclose(loaded_leaf, s1_text_leaf)
    tr2.train_epoch(1)
    s2_dir = str(tmp_path / "s2")
    tr2.save_models(s2_dir, epoch=1)
    fusion_ckpt = f"{s2_dir}/fusion_linear_arcface_1"
    encoder_ckpt = f"{s2_dir}/encoder_LSTM_linear_1"

    # ---- eval: prepare_* must load stage-2's bundled artifacts (partial
    # restore: the fusion file holds both 'net' and 'image_head')
    a3 = _args(tmp_path, CONFIG_NAME="Fusion",
               text_encoder_path=encoder_ckpt,
               image_encoder_path=fusion_ckpt,
               fusion_net_path=fusion_ckpt, is_ident=False, is_roc=False)
    test_dl, test_ds = prep.prepare_dataloader(a3, "test")
    a3.vocab_size = test_ds.n_words
    text_encoder, text_head = prep.prepare_text_encoder(a3)
    backbone = prep.prepare_backbone(a3)
    image_head = prep.prepare_image_head(a3)
    fusion_net = prep.prepare_fusion_net(a3)

    # loaded fusion params equal stage-2's trained params
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(
            fusion_net.variables["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            tr2.state.params["fusion_net"])[0]))

    m = run_test(a3, test_dl, backbone, image_head, fusion_net,
                 text_encoder, text_head)
    assert 0.0 <= m["auc"] <= 1.0


def test_bert_fcfm_checkpoint_handoff(tmp_path):
    """BERT variant: the text checkpoint carries BOTH 'model' and 'head'
    subtrees, and stage-2 runs the FCFM fusion net."""
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer

    a1 = _args(tmp_path, CONFIG_NAME="Train", en_type="BERT",
               bert_type="groupvit", bert_words_num=12)
    tr1 = Stage1Trainer(a1)
    tr1.train_epoch(1)
    s1 = str(tmp_path / "s1")
    tr1.save_encoders(s1, epoch=1)

    a2 = _args(tmp_path, CONFIG_NAME="Fusion", en_type="BERT",
               bert_type="groupvit", bert_words_num=12, fusion_type="fcfm",
               text_encoder_path=f"{s1}/groupvit_text_encoder_1",
               image_encoder_path=f"{s1}/arcface_image_encoder_1")
    tr2 = FusionTrainer(a2)
    # text encoder AND text head must carry stage-1 weights
    for name in ("text_encoder", "text_head"):
        a = np.asarray(jax.tree_util.tree_leaves(tr1.state.params[name])[0])
        b = np.asarray(jax.tree_util.tree_leaves(tr2.state.params[name])[0])
        np.testing.assert_allclose(a, b, err_msg=name)
    m = tr2.train_epoch(1)
    assert np.isfinite(m["loss"])


def test_extract_embeddings_cli_deterministic(tmp_path):
    """Serving entry point (src/extract_embeddings.py): runs end-to-end on
    synthetic data and is deterministic (eval transform + pinned caption) —
    regression for the r3 _backbone_feats signature breakage."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = []
    for i in range(2):
        out = tmp_path / f"emb{i}.npz"
        r = subprocess.run(
            [sys.executable, "src/extract_embeddings.py", "--cfg",
             "cfg/test.yml", "--synthetic", "--cpu", "--bert_type",
             "groupvit", "--out", str(out),
             # hermetic against artifacts at cfg/test.yml's DEFAULT
             # checkpoint paths: a real (bert) checkpoint there must not
             # be loaded into this groupvit run (a full-schedule soak
             # populating ./checkpoints broke exactly this)
             "--text_encoder_path", str(tmp_path / "absent_te"),
             "--image_encoder_path", str(tmp_path / "absent_ie"),
             "--fusion_net_path", str(tmp_path / "absent_fu")],
            cwd=repo, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        runs.append(np.load(out))
    assert runs[0]["embeddings"].shape[0] > 0
    np.testing.assert_array_equal(runs[0]["embeddings"],
                                  runs[1]["embeddings"])
    np.testing.assert_array_equal(runs[0]["keys"], runs[1]["keys"])
