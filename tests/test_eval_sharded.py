"""Sharded (multi-device) evaluation == single-device evaluation, exactly.

The reference evaluates under nn.DataParallel (utils/prepare.py:58 wraps
every module; utils/modules.py:92-168 is the multi-GPU test loop). Our
TPU-native counterpart (engine/evaluate.eval_mesh + _shard_eval) pads each
pair batch up to a multiple of the mesh size, shards it over the "data"
axis, and trims the padding scores on the host — results must be identical
to the single-device pass, including ragged final batches.

Runs on the 8-device virtual CPU mesh from tests/conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import evaluate as ev
from text_guided_face_recognition_tpu.engine import prepare as prep
from text_guided_face_recognition_tpu.parallel.mesh import make_mesh


def _args(**kw):
    # batch 12 is not divisible by 8: every batch exercises the pad path
    base = dict(
        en_type="LSTM", synthetic=True, batch_size=12, num_workers=2,
        compute_dtype="float32", num_classes=16, lstm_words_num=8,
        captions_per_image=2, manual_seed=0, fusion_type="linear",
        fusion_final_dim=640, is_ident=False, is_roc=False)
    base.update(kw)
    return TGFRConfig().replace(**base)


def test_shard_eval_pads_and_trims():
    mesh = make_mesh(8)
    a = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    (sharded,), n = ev._shard_eval([a], mesh)
    assert n == 10 and sharded.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(sharded)[:10], a)
    # single-device passthrough
    (same,), n1 = ev._shard_eval([a], None)
    assert n1 == 10 and same.shape == (10, 3)


def test_eval_mesh_selection():
    assert ev.eval_mesh(_args(num_devices=1)) is None
    m = ev.eval_mesh(_args(num_devices=8))
    assert m is not None and m.size == 8
    assert ev.eval_mesh(_args(num_devices=0)).size == jax.device_count()


def _bundles(args):
    text_encoder, text_head = prep.prepare_text_encoder(args)
    backbone = prep.prepare_backbone(args)
    image_head = prep.prepare_image_head(args)
    fusion_net = prep.prepare_fusion_net(args)
    return text_encoder, text_head, backbone, image_head, fusion_net


def test_run_test_sharded_matches_single_device(capsys):
    args1 = _args(num_devices=1)
    test_dl, test_ds = prep.prepare_dataloader(args1, "test")
    args1.vocab_size = test_ds.n_words
    te, th, bb, ih, fu = _bundles(args1)

    m_single = ev.run_test(args1, test_dl, bb, ih, fu, te, th)

    args8 = _args(num_devices=8)
    args8.vocab_size = test_ds.n_words
    m_sharded = ev.run_test(args8, test_dl, bb, ih, fu, te, th)

    assert m_single.keys() == m_sharded.keys()
    for k in m_single:
        np.testing.assert_allclose(
            m_single[k], m_sharded[k], rtol=0, atol=0,
            err_msg=f"metric {k} differs between sharded and single-device")
    # the padded rows must actually have been sharded over all 8 devices
    assert ev.eval_mesh(args8).size == 8


def test_org_face_test_sharded_matches_single_device(capsys):
    args1 = _args(num_devices=1)
    test_dl, test_ds = prep.prepare_dataloader(args1, "test")
    args1.vocab_size = test_ds.n_words
    bb = prep.prepare_backbone(args1)

    m_single = ev.org_face_test(args1, test_dl, bb)
    args8 = _args(num_devices=8)
    m_sharded = ev.org_face_test(args8, test_dl, bb)
    for k in m_single:
        np.testing.assert_allclose(m_single[k], m_sharded[k], rtol=0, atol=0,
                                   err_msg=f"metric {k}")


def test_sharded_pair_scores_are_data_sharded():
    """The jitted eval forward must actually place per-pair work across the
    mesh: its output sharding spans the 'data' axis (not a replicated
    single-device array)."""
    args = _args(num_devices=8)
    mesh = ev.eval_mesh(args)
    bb = prep.prepare_backbone(args)
    bb_vars = ev._replicate_tree(bb.variables, mesh)
    img = np.random.default_rng(0).normal(
        size=(16, args.img_size, args.img_size, 3)).astype(np.float32)
    (i1,), _ = ev._shard_eval([img], mesh)
    (i2,), _ = ev._shard_eval([img[::-1].copy()], mesh)
    out = ev._raw_pair_scores(bb.module, args.model_type, bb_vars, i1, i2)
    assert len(out.sharding.device_set) == 8
