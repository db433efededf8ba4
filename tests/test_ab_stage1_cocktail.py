"""Full stage-1 loss-cocktail A/B vs the ACTUAL reference training math.

Assembles one training step's LOSS exactly as the reference's Train.train
does (src/train_encoders_bert.py:272-320: DAMSM words+sent, ArcMargin+Focal
identity for both modalities, global_loss CLIP term, CMPC) using the
reference's own modules and loss functions on shared weights, and asserts our
Stage1Trainer.build_loss_fn produces the same total and per-term values on
the identical batch. Dropout is disabled on both sides (arch-table rate 0 /
torch .eval()) so the comparison is deterministic; BatchNorm runs in train
mode on both sides (batch statistics)."""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from ab_reference import import_reference  # noqa: E402

from text_guided_face_recognition_tpu.config import TGFRConfig  # noqa: E402
from text_guided_face_recognition_tpu.engine import convert as C  # noqa: E402
from text_guided_face_recognition_tpu.engine.stage1 import (  # noqa: E402
    Stage1Trainer,
)

pytestmark = pytest.mark.slow

BERT_LAYERS = 2
B, C_CLS, T = 8, 16, 24


@pytest.fixture(scope="module")
def ref():
    return import_reference(BERT_LAYERS)


@pytest.fixture(autouse=True)
def _small_dropless_bert(monkeypatch):
    import dataclasses as dc

    from text_guided_face_recognition_tpu.models import text_bert
    monkeypatch.setitem(
        text_bert.TEXT_ARCHS, "bert",
        dc.replace(text_bert.TEXT_ARCHS["bert"], layers=BERT_LAYERS,
                   dropout=0.0))


def _sd(m):
    return {k: np.asarray(v.detach().numpy())
            for k, v in m.state_dict().items()}


def test_stage1_bert_cocktail_matches_reference(ref):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    args_r = types.SimpleNamespace(
        CUDA=False, en_type="BERT", bert_type="bert", model_type="arcface",
        bert_words_num=T, aux_feat_dim_per_granularity=256,
        is_DAMSM=True, is_WRA=False, is_ident_loss=True, is_CLIP=True,
        is_CMP=True, lambda_id=1.0, lambda_clip=2.0,
        device=torch.device("cpu"),
        TRAIN=types.SimpleNamespace(SMOOTH=types.SimpleNamespace(
            GAMMA1=4.0, GAMMA2=5.0, GAMMA3=10.0)))

    # ---- reference modules (shared weights)
    enc_t = ref.models.TextEncoder(args_r).eval()    # dropout off
    head_t = ref.models.TextHeading(args_r).eval()
    bb_t = ref.iresnet.iresnet18().eval()            # frozen backbone
    ih_t = ref.models.ImageHeading(args_r).train()   # BN in batch-stats mode
    text_cls_t = ref.metrics.ArcMarginProduct(256, C_CLS, s=35.0, m=0.5)
    image_cls_t = ref.metrics.ArcMarginProduct(256, C_CLS, s=30.0, m=0.5)
    cmp_t = ref.losses.CMPLoss(is_CMPM=False, is_CMPC=True,
                               num_classes=C_CLS, feature_dim=256)
    focal_t = ref.losses.FocalLoss(gamma=2)

    # ---- shared batch
    imgs = rng.normal(0, 0.5, (B, 112, 112, 3)).astype(np.float32)
    caps = np.zeros((B, T), np.int64)
    caps[:, 0] = 101
    caps[:, 1:T - 1] = rng.integers(1000, 29000, (B, T - 2))
    caps[:, T - 1] = 102
    masks = np.ones((B, T), np.int64)
    class_ids = rng.integers(0, C_CLS, B).astype(np.int64)
    labels = torch.arange(B)

    # ---- reference loss assembly (Train.train :272-320)
    with torch.no_grad():
        words_emb, sent_emb = enc_t(torch.tensor(caps), torch.tensor(masks))
        words_emb, sent_emb = head_t(words_emb, sent_emb)
        img_features, words_features = bb_t(
            torch.tensor(imgs.transpose(0, 3, 1, 2)))
        img_features, words_features = ih_t(img_features, words_features)

        w0, w1, _ = ref.losses.words_loss(
            words_features, words_emb, labels, None, class_ids, B, args_r)
        s0, s1 = ref.losses.sent_loss(img_features, sent_emb, labels,
                                      class_ids, B, args_r)
        damsm = w0 + w1 + s0 + s1
        tid = focal_t(text_cls_t(sent_emb, torch.tensor(class_ids)),
                      torch.tensor(class_ids))
        iid = focal_t(image_cls_t(img_features, torch.tensor(class_ids)),
                      torch.tensor(class_ids))
        cl = ref.losses.global_loss(img_features, sent_emb)
        cmp, _, _ = cmp_t(sent_emb, img_features, torch.tensor(class_ids))
        ref_total = (damsm + args_r.lambda_id * (tid + iid) +
                     args_r.lambda_clip * cl + cmp)

    # ---- our trainer with the SAME weights
    args_o = TGFRConfig().replace(
        en_type="BERT", bert_type="bert", synthetic=True, batch_size=B,
        num_workers=2, max_epoch=1, compute_dtype="float32",
        num_classes=C_CLS, is_DAMSM=True, is_CLIP=True, is_ident_loss=True,
        is_CMP=True, lambda_id=1.0, lambda_clip=2.0, use_pallas=False)
    trainer = Stage1Trainer(args_o)

    def cast_like(a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.asarray(np.asarray(y), x.dtype), a, b)

    params = dict(trainer.state.params)
    params["text_encoder"] = cast_like(
        params["text_encoder"],
        C.convert_text_encoder_bundle(_sd(enc_t), "bert")["params"])
    params["text_head"] = cast_like(
        params["text_head"], C.convert_text_heading(_sd(head_t))["params"])
    ih_conv = C.convert_image_heading(_sd(ih_t))
    params["image_head"] = cast_like(params["image_head"],
                                     ih_conv["params"])
    params["text_cls"] = cast_like(
        params["text_cls"],
        {"weight": np.asarray(text_cls_t.weight.detach().numpy())})
    params["image_cls"] = cast_like(
        params["image_cls"],
        {"weight": np.asarray(image_cls_t.weight.detach().numpy())})
    params["cmp"] = cast_like(
        params["cmp"], {"W": np.asarray(cmp_t.W.detach().numpy())})

    frozen = cast_like(trainer.backbone.variables,
                       C.convert_iresnet(_sd(bb_t)))

    batch = {"img": jnp.asarray(imgs),
             "caps": jnp.asarray(caps, jnp.int32),
             "mask": jnp.asarray(masks, jnp.int32),
             "cls_id": jnp.asarray(class_ids, jnp.int32)}
    loss_fn = trainer.build_loss_fn()
    total, (_stats, metrics) = loss_fn(params, trainer.state.batch_stats,
                                       batch, frozen, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics["w_loss"]), float(w0 + w1),
                               rtol=2e-4)
    np.testing.assert_allclose(float(metrics["s_loss"]), float(s0 + s1),
                               rtol=2e-4)
    np.testing.assert_allclose(float(metrics["idn_loss"]),
                               float(tid + iid), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["clip_loss"]),
                               float(args_r.lambda_clip * cl), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["cmp_loss"]), float(cmp),
                               rtol=2e-4)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4)


def test_stage1_lstm_cocktail_matches_reference(ref):
    """LSTM-path cocktail (src/train_encoders_lstm.py:259-297): words-only
    DAMSM, ArcMargin+Focal identity, ClipLoss — text features produced by the
    reference's own sort/pack/encode/unsort dance (utils/prepare.py:124-130)."""
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    vocab, t_words = 400, 18

    args_r = types.SimpleNamespace(
        CUDA=False, en_type="LSTM", model_type="arcface",
        vocab_size=vocab, lstm_words_num=t_words, embedding_dim=256,
        aux_feat_dim_per_granularity=256, lambda_id=1.0, lambda_clip=1.0,
        device=torch.device("cpu"),
        TRAIN=types.SimpleNamespace(SMOOTH=types.SimpleNamespace(
            GAMMA1=4.0, GAMMA2=5.0, GAMMA3=10.0)))

    enc_t = ref.models.RNNEncoder(args_r, nhidden=256).eval()  # dropout off
    bb_t = ref.iresnet.iresnet18().eval()
    ih_t = ref.models.ImageHeading(args_r).train()
    text_cls_t = ref.metrics.ArcMarginProduct(256, C_CLS, s=35.0, m=0.5)
    image_cls_t = ref.metrics.ArcMarginProduct(256, C_CLS, s=30.0, m=0.5)
    focal_t = ref.losses.FocalLoss(gamma=2)
    clip_t = ref.losses.ClipLoss()

    imgs = rng.normal(0, 0.5, (B, 112, 112, 3)).astype(np.float32)
    caps = np.zeros((B, t_words), np.int64)
    cap_lens = rng.integers(4, t_words + 1, B).astype(np.int64)
    cap_lens[0] = t_words
    for i, n in enumerate(cap_lens):
        caps[i, :n] = rng.integers(1, vocab, n)
    class_ids = rng.integers(0, C_CLS, B).astype(np.int64)
    labels = torch.arange(B)

    # reference text path: its real sort/pack/encode/unsort
    sys.path.insert(0, os.environ.get("TGFR_REF_ROOT", "/root/reference"))
    from utils.prepare import prepare_train_data  # reference module

    with torch.no_grad():
        data = (torch.tensor(imgs.transpose(0, 3, 1, 2)), torch.tensor(caps),
                torch.tensor(cap_lens), None, torch.tensor(class_ids))
        _imgs, words_emb, sent_emb, _k, _l, _cl = prepare_train_data(
            data, enc_t)
        img_features, words_features = bb_t(
            torch.tensor(imgs.transpose(0, 3, 1, 2)))
        img_features, words_features = ih_t(img_features, words_features)

        w0, w1, _ = ref.losses.words_loss(
            words_features, words_emb, labels, torch.tensor(cap_lens),
            class_ids, B, args_r)
        tid = focal_t(text_cls_t(sent_emb, torch.tensor(class_ids)),
                      torch.tensor(class_ids))
        iid = focal_t(image_cls_t(img_features, torch.tensor(class_ids)),
                      torch.tensor(class_ids))
        cl = clip_t(sent_emb, img_features, args_r, logit_scale=1)
        ref_total = (w0 + w1) + args_r.lambda_id * (tid + iid) + \
            args_r.lambda_clip * cl

    args_o = TGFRConfig().replace(
        en_type="LSTM", synthetic=True, batch_size=B, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=C_CLS,
        vocab_size=vocab, lstm_words_num=t_words, embedding_dim=256,
        is_DAMSM=True, is_CLIP=True, is_ident_loss=True, is_CMP=False,
        lambda_id=1.0, lambda_clip=1.0, use_pallas=False)
    trainer = Stage1Trainer(args_o)
    # dropout off to match the torch .eval() side; synthetic mode rebinds
    # vocab_size to its own corpus, so pin the test vocab as well
    trainer.text_encoder.module = trainer.text_encoder.module.clone(
        drop_prob=0.0, vocab_size=vocab)

    def cast_like(a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.asarray(np.asarray(y), x.dtype), a, b)

    params = dict(trainer.state.params)
    params["text_encoder"] = cast_like(
        params["text_encoder"],
        C.convert_rnn_encoder(_sd(enc_t), "LSTM")["params"])
    params["image_head"] = cast_like(
        params["image_head"], C.convert_image_heading(_sd(ih_t))["params"])
    params["text_cls"] = cast_like(
        params["text_cls"],
        {"weight": np.asarray(text_cls_t.weight.detach().numpy())})
    params["image_cls"] = cast_like(
        params["image_cls"],
        {"weight": np.asarray(image_cls_t.weight.detach().numpy())})
    frozen = cast_like(trainer.backbone.variables,
                       C.convert_iresnet(_sd(bb_t)))

    batch = {"img": jnp.asarray(imgs),
             "caps": jnp.asarray(caps, jnp.int32),
             "cap_len": jnp.asarray(cap_lens, jnp.int32),
             "cls_id": jnp.asarray(class_ids, jnp.int32)}
    loss_fn = trainer.build_loss_fn()
    total, (_stats, metrics) = loss_fn(params, trainer.state.batch_stats,
                                       batch, frozen, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics["w_loss"]), float(w0 + w1),
                               rtol=2e-4)
    np.testing.assert_allclose(float(metrics["idn_loss"]),
                               float(tid + iid), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["clip_loss"]), float(cl),
                               rtol=2e-4)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4)
