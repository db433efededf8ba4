"""Gradient-level A/B vs torch autograd — the last analytic parity layer.

The r2 cocktail tests (tests/test_ab_stage1_cocktail.py) proved the stage-1
loss VALUES match the reference's training assembly; this file proves
d(loss)/d(params) matches torch `loss.backward()` on the same shared-weight
graphs (reference backprop path: src/train_encoders_bert.py:323-331,
src/train_encoders_lstm.py hot loop). This is what makes "trained-model
equivalence" an analytic claim rather than an empirical one: subtle
divergences (stop_gradient placement, the ArcMargin acos/clamp backward,
BN batch-stats backward, the masked-LSE words_loss backward, the packed-LSTM
backward) are invisible to every forward-only test.

Method: the engine/convert.py weight converters are LINEAR maps
(rename / transpose / concat), so applying them to a state_dict of
`param.grad` tensors converts torch's gradient tree into our param-tree
layout exactly. The one non-injective case — the RNN converter stores
b = b_ih + b_hh as one fused bias — is handled by halving the converted
grad (torch gives dL/db_ih == dL/db_hh == dL/db).

The measured max-relative-deltas are recorded in docs/PARITY_REPORT.md.
"""

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

from gradcheck import assert_and_report, collect_deltas, grad_sd  # noqa: E402

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


def test_stage1_bert_gradients_match_torch_autograd(ref):
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

    # reference modules: eval() (dropout off) but autograd ON; BN head in
    # train mode (batch stats) exactly like Train.train
    enc_t = ref.models.TextEncoder(args_r).eval()
    head_t = ref.models.TextHeading(args_r).eval()
    bb_t = ref.iresnet.iresnet18().eval()
    ih_t = ref.models.ImageHeading(args_r).train()
    text_cls_t = ref.metrics.ArcMarginProduct(256, C_CLS, s=35.0, m=0.5)
    image_cls_t = ref.metrics.ArcMarginProduct(256, C_CLS, s=30.0, m=0.5)
    cmp_t = ref.losses.CMPLoss(is_CMPM=False, is_CMPC=True,
                               num_classes=C_CLS, feature_dim=256)
    focal_t = ref.losses.FocalLoss(gamma=2)

    imgs = rng.normal(0, 0.5, (B, 112, 112, 3)).astype(np.float32)
    caps = np.zeros((B, T), np.int64)
    caps[:, 0] = 101
    caps[:, 1:T - 1] = rng.integers(1000, 29000, (B, T - 2))
    caps[:, T - 1] = 102
    masks = np.ones((B, T), np.int64)
    class_ids = rng.integers(0, C_CLS, B).astype(np.int64)
    labels = torch.arange(B)

    # ---- torch forward+backward (the reference's exact loss assembly,
    #      src/train_encoders_bert.py:272-331, frozen-backbone features
    #      detached = our stop_gradient placement)
    words_emb, sent_emb = enc_t(torch.tensor(caps), torch.tensor(masks))
    words_emb, sent_emb = head_t(words_emb, sent_emb)
    with torch.no_grad():
        gl_t, lc_t = bb_t(torch.tensor(imgs.transpose(0, 3, 1, 2)))
    img_features, words_features = ih_t(gl_t.detach(), lc_t.detach())

    w0, w1, _ = ref.losses.words_loss(
        words_features, words_emb, labels, None, class_ids, B, args_r)
    s0, s1 = ref.losses.sent_loss(img_features, sent_emb, labels,
                                  class_ids, B, args_r)
    tid = focal_t(text_cls_t(sent_emb, torch.tensor(class_ids)),
                  torch.tensor(class_ids))
    iid = focal_t(image_cls_t(img_features, torch.tensor(class_ids)),
                  torch.tensor(class_ids))
    cl = ref.losses.global_loss(img_features, sent_emb)
    cmp, _, _ = cmp_t(sent_emb, img_features, torch.tensor(class_ids))
    ref_total = ((w0 + w1 + s0 + s1) + args_r.lambda_id * (tid + iid) +
                 args_r.lambda_clip * cl + cmp)
    ref_total.backward()

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
    params["image_head"] = cast_like(
        params["image_head"], C.convert_image_heading(_sd(ih_t))["params"])
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
    (total, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, trainer.state.batch_stats, batch, frozen,
        jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4)

    # ---- convert torch grads through the same (linear) converters
    g_ref = {
        "text_encoder": C.convert_text_encoder_bundle(
            grad_sd(enc_t), "bert")["params"],
        "text_head": C.convert_text_heading(grad_sd(head_t))["params"],
        "image_head": C.convert_image_heading(grad_sd(ih_t))["params"],
        "text_cls": {"weight": np.asarray(text_cls_t.weight.grad.numpy())},
        "image_cls": {"weight": np.asarray(image_cls_t.weight.grad.numpy())},
        "cmp": {"W": np.asarray(cmp_t.W.grad.numpy())},
    }

    deltas = {}
    for key in ("text_encoder", "text_head", "image_head", "text_cls",
                "image_cls", "cmp"):
        collect_deltas(grads[key], g_ref[key], f"{key}:", deltas)
    assert_and_report(deltas, "stage1_bert_grads")


def test_stage1_lstm_gradients_match_torch_autograd(ref):
    """LSTM path: the packed-biLSTM backward vs our masked-scan backward
    (plus the words-only DAMSM + ClipLoss + margin-head backwards)."""
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

    enc_t = ref.models.RNNEncoder(args_r, nhidden=256).eval()
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

    sys.path.insert(0, os.environ.get("TGFR_REF_ROOT", "/root/reference"))
    from utils.dataset_utils import rm_sort, sort_sents  # reference module

    # reference text path WITH grads: its real sort/encode/unsort (the
    # no-grad wrapper in utils/dataset_utils.py:25-34 is the compat_frozen
    # branch; default here trains the encoder, DEVIATIONS #1)
    caps_s, sorted_cap_lens, sorted_cap_idxs = sort_sents(
        torch.tensor(caps), torch.tensor(cap_lens))
    hidden = enc_t.init_hidden(B)
    words_emb, sent_emb = enc_t(caps_s, sorted_cap_lens, hidden)
    words_emb = rm_sort(words_emb, sorted_cap_idxs)
    sent_emb = rm_sort(sent_emb, sorted_cap_idxs)
    with torch.no_grad():
        gl_t, lc_t = bb_t(torch.tensor(imgs.transpose(0, 3, 1, 2)))
    img_features, words_features = ih_t(gl_t.detach(), lc_t.detach())

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
    ref_total.backward()

    args_o = TGFRConfig().replace(
        en_type="LSTM", synthetic=True, batch_size=B, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=C_CLS,
        vocab_size=vocab, lstm_words_num=t_words, embedding_dim=256,
        is_DAMSM=True, is_CLIP=True, is_ident_loss=True, is_CMP=False,
        lambda_id=1.0, lambda_clip=1.0, use_pallas=False)
    trainer = Stage1Trainer(args_o)
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
    (total, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, trainer.state.batch_stats, batch, frozen,
        jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4)

    # converted grad tree; the fused b = b_ih + b_hh biases double the grad
    # (dL/db_ih == dL/db_hh == dL/db), so halve exactly those leaves
    g_rnn = C.convert_rnn_encoder(grad_sd(enc_t), "LSTM")["params"]
    for cell in ("fwd", "bwd"):
        for gate, sub in g_rnn[cell].items():
            if "bias" in sub and gate.startswith("h"):
                sub["bias"] = np.asarray(sub["bias"]) / 2.0
    g_ref = {
        "text_encoder": g_rnn,
        "image_head": C.convert_image_heading(grad_sd(ih_t))["params"],
        "text_cls": {"weight": np.asarray(text_cls_t.weight.grad.numpy())},
        "image_cls": {"weight": np.asarray(image_cls_t.weight.grad.numpy())},
    }
    deltas = {}
    for key in ("text_encoder", "image_head", "text_cls", "image_cls"):
        collect_deltas(grads[key], g_ref[key], f"{key}:", deltas)
    assert_and_report(deltas, "stage1_lstm_grads")
