"""Stage-2 training-math A/B vs the ACTUAL reference Fusion.train assembly.

Assembles the reference's stage-2 loss exactly as src/fusion_bert.py does
(get_fusion_output -> ArcMarginProduct(fusion_final_dim=640) -> FocalLoss/CE:
src/fusion_bert.py:92-115,194-238) with the reference's own torch modules on
shared weights, and checks FusionTrainer.build_loss_fn reproduces (a) the
loss value and (b) d(loss)/d(params) via torch autograd (same converted-
gradient method as tests/test_ab_gradients.py).

Gradient comparison runs under compat_frozen_text=True because the reference
computes words/sent under torch.no_grad() then requires_grad_()s the DETACHED
tensors (src/fusion_bert.py:205-212) — its text encoder/head receive no
gradients; our flag reproduces that with stop_gradient. The trainable-text
default covers the same graph minus the stop, and its forward value is
asserted too.
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
from text_guided_face_recognition_tpu.engine.stage2 import (  # noqa: E402
    FusionTrainer,
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


@pytest.mark.parametrize("fusion_type", ["fcfm", "linear"])
def test_stage2_loss_and_grads_match_reference(ref, fusion_type):
    torch.manual_seed(3)
    rng = np.random.default_rng(3)

    args_r = types.SimpleNamespace(
        CUDA=False, en_type="BERT", bert_type="bert", model_type="arcface",
        bert_words_num=T, aux_feat_dim_per_granularity=256,
        fusion_final_dim=640, easy_margin=False,
        device=torch.device("cpu"))

    enc_t = ref.models.TextEncoder(args_r).eval()     # dropout off
    head_t = ref.models.TextHeading(args_r).eval()
    bb_t = ref.iresnet.iresnet18().eval()
    ih_t = ref.models.ImageHeading(args_r).train()    # BN batch-stats mode
    if fusion_type == "fcfm":
        fu_t = ref.fusion.Working(args_r).train()
    else:
        fu_t = ref.fusion.LinearFusion(args_r).train()
    metric_t = ref.metrics.ArcMarginProduct(640, C_CLS, s=30.0, m=0.5,
                                            easy_margin=False)
    focal_t = ref.losses.FocalLoss(gamma=2)

    imgs = rng.normal(0, 0.5, (B, 112, 112, 3)).astype(np.float32)
    caps = np.zeros((B, T), np.int64)
    caps[:, 0] = 101
    caps[:, 1:T - 1] = rng.integers(1000, 29000, (B, T - 2))
    caps[:, T - 1] = 102
    masks = np.ones((B, T), np.int64)
    class_ids = rng.integers(0, C_CLS, B).astype(np.int64)
    label = torch.tensor(class_ids)

    # ---- reference Fusion.train step (:205-238): text under no_grad,
    #      DETACHED then requires_grad_(), frozen backbone, head+fusion+margin
    with torch.no_grad():
        words_emb, sent_emb = enc_t(torch.tensor(caps), torch.tensor(masks))
        words_emb, sent_emb = head_t(words_emb, sent_emb)
        gl_t, lc_t = bb_t(torch.tensor(imgs.transpose(0, 3, 1, 2)))
    words_emb = words_emb.detach().requires_grad_()
    sent_emb = sent_emb.detach().requires_grad_()
    img_feats, local_feats = ih_t(gl_t.detach(), lc_t.detach())
    if fusion_type == "fcfm":
        output = fu_t(local_feats, words_emb, img_feats, sent_emb)
    else:
        output = fu_t(img_feats, sent_emb)
    logits = metric_t(output, label)
    ref_loss = focal_t(logits, label)
    ref_loss.backward()

    # ---- our trainer with the SAME weights (grad A/B under the reference's
    #      frozen-text semantics)
    args_o = TGFRConfig().replace(
        en_type="BERT", bert_type="bert", model_type="arcface",
        synthetic=True, batch_size=B, num_workers=2, max_epoch=1,
        compute_dtype="float32", num_classes=C_CLS,
        fusion_type=fusion_type, fusion_final_dim=640, easy_margin=False,
        loss="focal_loss", compat_frozen_text=True, use_pallas=False,
        CONFIG_NAME="Fusion")
    trainer = FusionTrainer(args_o)

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
    if fusion_type == "fcfm":
        fu_conv = C.convert_fcfm(_sd(fu_t))
    else:
        fu_conv = C.convert_linear_fusion(_sd(fu_t))
    params["fusion_net"] = cast_like(params["fusion_net"],
                                     fu_conv["params"])
    params["metric_fc"] = cast_like(
        params["metric_fc"],
        {"weight": np.asarray(metric_t.weight.detach().numpy())})
    frozen = cast_like(trainer.backbone.variables,
                       C.convert_iresnet(_sd(bb_t)))
    batch_stats = dict(trainer.state.batch_stats)
    if fusion_type == "fcfm":
        batch_stats["fusion_net"] = cast_like(batch_stats["fusion_net"],
                                              fu_conv["batch_stats"])

    batch = {"img": jnp.asarray(imgs),
             "caps": jnp.asarray(caps, jnp.int32),
             "mask": jnp.asarray(masks, jnp.int32),
             "cls_id": jnp.asarray(class_ids, jnp.int32)}
    loss_fn = trainer.build_loss_fn()
    (total, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch_stats, batch, frozen, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(total), float(ref_loss), rtol=2e-4)

    # trainable-text default: same forward value (stop_gradient is forward-
    # transparent), different backward surface
    args_t = args_o.replace(compat_frozen_text=False)
    trainer_t = FusionTrainer(args_t)
    total_t, _ = trainer_t.build_loss_fn()(
        params, batch_stats, batch, frozen, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(total_t), float(ref_loss), rtol=2e-4)

    g_ref = {
        "image_head": C.convert_image_heading(grad_sd(ih_t))["params"],
        "fusion_net": (C.convert_fcfm(grad_sd(fu_t))["params"]
                       if fusion_type == "fcfm" else
                       C.convert_linear_fusion(grad_sd(fu_t))["params"]),
        "metric_fc": {"weight": np.asarray(metric_t.weight.grad.numpy())},
    }
    deltas = {}
    for key in ("image_head", "fusion_net", "metric_fc"):
        collect_deltas(grads[key], g_ref[key], f"{key}:", deltas)
    # frozen-text reproduction: zero gradient into the text tower
    for leaf in jax.tree_util.tree_leaves(grads["text_encoder"]):
        assert float(jnp.abs(leaf).max()) == 0.0
    assert_and_report(deltas, f"stage2_{fusion_type}_grads")
