"""Training-math A/B against the ACTUAL reference loss/margin code.

Round 2 pinned the eval path against the real reference (tools/ab_reference);
this pins the TRAINING side the same way: the reference's own
models/losses.py and models/metrics.py (imported from /root/reference,
executed, never copied) vs ops/losses.py / ops/margins.py / ops/wra.py on
identical inputs and weights."""

import math
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from ab_reference import import_reference  # noqa: E402

from text_guided_face_recognition_tpu.ops import losses as L  # noqa: E402
from text_guided_face_recognition_tpu.ops import margins as MG  # noqa: E402
from text_guided_face_recognition_tpu.ops.wra import (  # noqa: E402
    word_region_alignment_loss,
)

pytestmark = pytest.mark.slow

B, D, T = 6, 32, 10


@pytest.fixture(scope="module")
def ref():
    return import_reference(2)


def _args(en_type="BERT"):
    return types.SimpleNamespace(
        CUDA=False, en_type=en_type, bert_words_num=T + 2,
        device=torch.device("cpu"), temperature=0.07,
        TRAIN=types.SimpleNamespace(
            SMOOTH=types.SimpleNamespace(GAMMA1=4.0, GAMMA2=5.0, GAMMA3=10.0)))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_sent_loss_ab(ref, rng):
    cnn = rng.normal(size=(B, D)).astype(np.float32)
    rnn = rng.normal(size=(B, D)).astype(np.float32)
    class_ids = np.asarray([0, 1, 1, 2, 3, 3])
    labels = torch.arange(B)
    l0, l1 = ref.losses.sent_loss(torch.tensor(cnn), torch.tensor(rnn),
                                  labels, class_ids, B, _args())
    o0, o1 = L.sent_loss(jnp.asarray(cnn), jnp.asarray(rnn),
                         jnp.arange(B), jnp.asarray(class_ids), gamma3=10.0)
    np.testing.assert_allclose(float(o0), float(l0), rtol=1e-5)
    np.testing.assert_allclose(float(o1), float(l1), rtol=1e-5)


def test_words_loss_bert_ab(ref, rng):
    img = rng.normal(size=(B, D, 14, 14)).astype(np.float32)
    words = rng.normal(size=(B, D, T)).astype(np.float32)
    labels = torch.arange(B)
    l0, l1, _ = ref.losses.words_loss(
        torch.tensor(img), torch.tensor(words), labels, None, None, B,
        _args("BERT"))
    o0, o1 = L.words_loss(jnp.asarray(img), jnp.asarray(words),
                          jnp.arange(B), gamma1=4.0, gamma2=5.0, gamma3=10.0)
    np.testing.assert_allclose(float(o0), float(l0), rtol=1e-4)
    np.testing.assert_allclose(float(o1), float(l1), rtol=1e-4)


def test_words_loss_lstm_variable_lengths_ab(ref, rng):
    img = rng.normal(size=(B, D, 14, 14)).astype(np.float32)
    words = rng.normal(size=(B, D, T)).astype(np.float32)
    cap_lens = np.asarray([T, 7, 5, 9, 4, 6])
    labels = torch.arange(B)
    l0, l1, _ = ref.losses.words_loss(
        torch.tensor(img), torch.tensor(words), labels,
        torch.tensor(cap_lens), None, B, _args("LSTM"))
    mask = (np.arange(T)[None, :] < cap_lens[:, None])
    o0, o1 = L.words_loss(jnp.asarray(img), jnp.asarray(words),
                          jnp.arange(B), word_mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(o0), float(l0), rtol=1e-4)
    np.testing.assert_allclose(float(o1), float(l1), rtol=1e-4)


def test_global_and_clip_losses_ab(ref, rng):
    cnn = rng.normal(size=(B, D)).astype(np.float32)
    rnn = rng.normal(size=(B, D)).astype(np.float32)
    g = ref.losses.global_loss(torch.tensor(cnn), torch.tensor(rnn))
    ours = L.global_loss(jnp.asarray(cnn), jnp.asarray(rnn))
    np.testing.assert_allclose(float(ours), float(g), rtol=1e-5)

    clip = ref.losses.ClipLoss()
    ref_v = clip(torch.tensor(cnn), torch.tensor(rnn), _args(), logit_scale=1)
    # reference forward(text_features, image_features) -> logits_per_image =
    # scale * image @ text.T
    our_v = L.clip_loss(jnp.asarray(cnn), jnp.asarray(rnn), logit_scale=1.0)
    np.testing.assert_allclose(float(our_v), float(ref_v), rtol=1e-5)

    soft = ref.losses.clip_loss(torch.tensor(cnn), torch.tensor(rnn), _args())
    ours_soft = L.clip_soft_loss(jnp.asarray(cnn), jnp.asarray(rnn),
                                 temperature=0.07)
    np.testing.assert_allclose(float(ours_soft), float(soft), rtol=1e-4)


def test_cmp_focal_kl_ab(ref, rng):
    n_cls = 8
    te = rng.normal(size=(B, D)).astype(np.float32)
    ie = rng.normal(size=(B, D)).astype(np.float32)
    labels = np.asarray([0, 1, 1, 2, 5, 5])
    cmp = ref.losses.CMPLoss(is_CMPM=True, is_CMPC=True, num_classes=n_cls,
                             feature_dim=D)
    total, cmpc, cmpm = cmp(torch.tensor(te), torch.tensor(ie),
                            torch.tensor(labels))
    W = np.asarray(cmp.W.detach().numpy())
    o_cmpc = L.cmpc_loss(jnp.asarray(te), jnp.asarray(ie),
                         jnp.asarray(labels), jnp.asarray(W))
    o_cmpm = L.cmpm_loss(jnp.asarray(te), jnp.asarray(ie), jnp.asarray(labels))
    np.testing.assert_allclose(float(o_cmpc), float(cmpc), rtol=1e-4)
    np.testing.assert_allclose(float(o_cmpm), float(cmpm), rtol=1e-4,
                               atol=1e-6)

    logits = rng.normal(size=(B, n_cls)).astype(np.float32)
    fl = ref.losses.FocalLoss(gamma=2)
    ref_f = fl(torch.tensor(logits), torch.tensor(labels))
    our_f = L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
    np.testing.assert_allclose(float(our_f), float(ref_f), rtol=1e-5)

    mu = rng.normal(size=(B, D)).astype(np.float32)
    logvar = rng.normal(size=(B, D)).astype(np.float32)
    np.testing.assert_allclose(
        float(L.kl_loss(jnp.asarray(mu), jnp.asarray(logvar))),
        float(ref.losses.KL_loss(torch.tensor(mu), torch.tensor(logvar))),
        rtol=1e-5)


def test_margin_heads_ab(ref, rng):
    n_cls = 12
    emb = rng.normal(size=(B, D)).astype(np.float32)
    labels = np.asarray([0, 3, 3, 7, 11, 5])

    arc = ref.metrics.ArcMarginProduct(D, n_cls, s=30.0, m=0.5)
    ref_out = arc(torch.tensor(emb), torch.tensor(labels)).detach().numpy()
    ours = MG.arc_margin_logits(jnp.asarray(emb),
                                jnp.asarray(arc.weight.detach().numpy()),
                                jnp.asarray(labels), s=30.0, m=0.5)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4,
                               atol=1e-5)

    add = ref.metrics.AddMarginProduct(D, n_cls, s=30.0, m=0.4)
    ref_out = add(torch.tensor(emb), torch.tensor(labels)).detach().numpy()
    ours = MG.add_margin_logits(jnp.asarray(emb),
                                jnp.asarray(add.weight.detach().numpy()),
                                jnp.asarray(labels), s=30.0, m=0.4)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4,
                               atol=1e-5)

    sph = ref.metrics.SphereProduct(D, n_cls, m=4)
    ref_out = sph(torch.tensor(emb), torch.tensor(labels)).detach().numpy()
    ours, it = MG.sphere_margin_logits(
        jnp.asarray(emb), jnp.asarray(sph.weight.detach().numpy()),
        jnp.asarray(labels), iteration=0, m=4)
    assert float(it) == 1.0
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-3,
                               atol=1e-4)

    ada = ref.metrics.AdaFace(embedding_size=D, classnum=n_cls)
    norms = np.linalg.norm(emb, axis=1, keepdims=True).astype(np.float32)
    ref_out = ada(torch.tensor(emb), torch.tensor(norms),
                  torch.tensor(labels)).detach().numpy()
    ours, new_mean, new_std = MG.adaface_logits(
        jnp.asarray(emb), jnp.asarray(ada.kernel.detach().numpy()),
        jnp.asarray(norms[:, 0]), jnp.asarray(labels),
        batch_mean=jnp.asarray(20.0), batch_std=jnp.asarray(100.0))
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(float(new_mean),
                               float(ada.batch_mean), rtol=1e-4)
    np.testing.assert_allclose(float(new_std),
                               float(ada.batch_std), rtol=1e-4)


def test_wra_reference_is_broken_ours_is_live(ref, rng):
    """The reference WordRegionAlignment.forward computes loss_word but its
    `return` statement sits INSIDE the giant commented-out block
    (models/losses.py:426-483), so the real module returns None — there is no
    reference behavior to A/B. Pin that fact, and that our made-live port
    (ops/wra.py, oracle-tested in test_wra.py) returns a finite loss on the
    same inputs."""
    n_r = 16
    word = rng.normal(size=(B, T, 256)).astype(np.float32)
    region = rng.normal(size=(B, n_r, 256)).astype(np.float32)
    attn = rng.uniform(0.01, 1.0, size=(B, T)).astype(np.float32)

    wra = ref.losses.WordRegionAlignment()
    ref_v = wra(torch.tensor(word),  # img_emb: only batch size is read
                torch.tensor(region), None, torch.tensor(word),
                torch.tensor(attn))
    assert ref_v is None  # if this fails, the reference changed — add the A/B
    ours = word_region_alignment_loss(jnp.asarray(word), jnp.asarray(region),
                                      jnp.asarray(attn))
    assert np.isfinite(float(ours))
