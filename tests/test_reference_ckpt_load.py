"""End-to-end: REAL reference checkpoint bundles load through engine/prepare.

Builds the reference's own torch modules (imported from /root/reference via
tools.ab_reference's shims), saves checkpoints in the reference's exact
formats (src/train_encoders_bert.py:59-80: {'model','head'} / {'image_head'};
utils/utils.py:84-88: {'net'}; utils/prepare.py:27-33 LSTM {'model'}), loads
them through prepare_text_encoder / prepare_image_head / prepare_fusion_net,
and asserts activation parity with the torch originals."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from ab_reference import import_reference  # noqa: E402

from text_guided_face_recognition_tpu.config import TGFRConfig  # noqa: E402
from text_guided_face_recognition_tpu.engine import prepare  # noqa: E402

pytestmark = pytest.mark.slow

BERT_LAYERS = 2


@pytest.fixture(scope="module")
def ref():
    return import_reference(BERT_LAYERS)


@pytest.fixture(autouse=True)
def _small_bert(monkeypatch):
    import dataclasses as dc

    from text_guided_face_recognition_tpu.models import text_bert
    monkeypatch.setitem(
        text_bert.TEXT_ARCHS, "bert",
        dc.replace(text_bert.TEXT_ARCHS["bert"], layers=BERT_LAYERS))


def _args_ref(ref):
    import types
    return types.SimpleNamespace(
        device=torch.device("cpu"), en_type="BERT", bert_type="bert",
        model_type="arcface", bert_words_num=24,
        aux_feat_dim_per_granularity=256, fusion_final_dim=640,
        vocab_size=300, lstm_words_num=18, embedding_dim=256)


def test_reference_text_bundle_loads(ref, tmp_path):
    torch.manual_seed(0)
    a = _args_ref(ref)
    enc_t = ref.models.TextEncoder(a).eval()
    head_t = ref.models.TextHeading(a).eval()
    path = tmp_path / "bert_text_encoder_9.pth"
    torch.save({"model": enc_t.state_dict(), "head": head_t.state_dict()},
               path)

    args = TGFRConfig().replace(en_type="BERT", bert_type="bert",
                                compute_dtype="float32",
                                text_encoder_path=str(path))
    enc_b, head_b = prepare.prepare_text_encoder(args)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, (2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    with torch.no_grad():
        w_t, s_t = enc_t(torch.tensor(ids), torch.tensor(mask))
        words_t, sent_t = head_t(w_t, s_t)
    w_o, s_o = enc_b.module.apply(enc_b.variables,
                                  jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.int32))
    words_o, sent_o = head_b.module.apply(head_b.variables, w_o)
    np.testing.assert_allclose(np.asarray(words_o), words_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sent_o), sent_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_reference_lstm_ckpt_loads(ref, tmp_path):
    torch.manual_seed(1)
    a = _args_ref(ref)
    a.en_type = "LSTM"
    enc_t = ref.models.RNNEncoder(a, nhidden=256).eval()
    path = tmp_path / "LSTM_text_encoder_5.pth"
    torch.save({"model": enc_t.state_dict()}, path)

    args = TGFRConfig().replace(en_type="LSTM", vocab_size=300,
                                compute_dtype="float32",
                                text_encoder_path=str(path))
    enc_b, head_b = prepare.prepare_text_encoder(args)
    assert head_b is None

    rng = np.random.default_rng(1)
    caps = rng.integers(1, 300, (3, 18)).astype(np.int64)
    lens = np.asarray([18, 9, 4], np.int64)
    for i, n in enumerate(lens):
        caps[i, n:] = 0
    with torch.no_grad():
        hidden = enc_t.init_hidden(3)
        w_t, s_t = enc_t(torch.tensor(caps), torch.tensor(lens), hidden)
    w_o, s_o = enc_b.module.apply(enc_b.variables,
                                  jnp.asarray(caps, jnp.int32),
                                  jnp.asarray(lens, jnp.int32),
                                  deterministic=True)
    np.testing.assert_allclose(np.asarray(s_o), s_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_o), w_t.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_reference_image_head_ckpt_loads(ref, tmp_path):
    torch.manual_seed(2)
    a = _args_ref(ref)
    ih_t = ref.models.ImageHeading(a).eval()
    path = tmp_path / "arcface_image_encoder_9.pth"
    torch.save({"image_head": ih_t.state_dict()}, path)

    args = TGFRConfig().replace(image_encoder_path=str(path),
                                compute_dtype="float32")
    ih_b = prepare.prepare_image_head(args)

    rng = np.random.default_rng(2)
    gl = rng.normal(size=(2, 512)).astype(np.float32)
    lc = rng.normal(size=(2, 14, 14, 256)).astype(np.float32)
    with torch.no_grad():
        g_t, l_t = ih_t(torch.tensor(gl),
                        torch.tensor(lc.transpose(0, 3, 1, 2)))
    g_o, l_o = ih_b.module.apply(ih_b.variables, jnp.asarray(gl),
                                 jnp.asarray(lc), train=False)
    np.testing.assert_allclose(np.asarray(g_o), g_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_o),
                               l_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_reference_fusion_ckpt_loads(ref, tmp_path):
    torch.manual_seed(3)
    net_t = ref.fusion.Working(256).eval()
    path = tmp_path / "fusion_9.pth"
    torch.save({"net": net_t.state_dict()}, path)

    args = TGFRConfig().replace(en_type="BERT", fusion_type="fcfm",
                                compute_dtype="float32",
                                fusion_net_path=str(path))
    fu_b = prepare.prepare_fusion_net(args)

    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 14, 14, 256)).astype(np.float32)
    word = rng.normal(size=(2, 256, 22)).astype(np.float32)
    gl = rng.normal(size=(2, 256)).astype(np.float32)
    sent = rng.normal(size=(2, 256)).astype(np.float32)
    with torch.no_grad():
        o_t = net_t(torch.tensor(img.transpose(0, 3, 1, 2)),
                    torch.tensor(word), torch.tensor(gl), torch.tensor(sent))
    o_o = fu_b.module.apply(fu_b.variables, jnp.asarray(img),
                            jnp.asarray(word), jnp.asarray(gl),
                            jnp.asarray(sent), train=False)
    np.testing.assert_allclose(np.asarray(o_o), o_t.numpy(), rtol=1e-3,
                               atol=1e-4)
