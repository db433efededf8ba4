"""Optimizer trees for the two training stages.

The reference drives three torch optimizers per stage with hand-stepped
schedules (reference: src/train_encoders_bert.py:212-226 and :398-411,
src/train_encoders_lstm.py:180-195, src/fusion_bert.py:118-141 + :75-85).
Here each stage is ONE optax.multi_transform over the combined param tree with
three label groups — 'head' / 'encoder' / 'cls' — and per-group injectable
learning rates so the reference's epoch-edge LR edits (ExponentialLR 0.98,
StepLR, the manual /10 at epochs {3,8}) are reproduced exactly from the host
between epochs, with zero recompilation (optax.inject_hyperparams).

torch-Adam semantics notes: torch `weight_decay` is L2-added-to-grad (not
AdamW) — expressed as add_decayed_weights *before* scale_by_adam; betas follow
each stage's reference values (the LSTM trainer really uses betas=(0.9, 0.5):
src/train_encoders_lstm.py:180-183).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp
import optax

__all__ = ["make_stage1_bert_tx", "make_stage1_lstm_tx", "make_stage2_tx",
           "label_params"]


def _torch_adam(b1: float, b2: float, weight_decay: float = 0.0,
                eps: float = 1e-8):
    """torch.optim.Adam equivalent with injectable lr."""
    @optax.inject_hyperparams
    def make(learning_rate):
        steps = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
        steps += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                  optax.scale(-1.0)]
        return optax.chain(*steps, optax.scale(learning_rate))
    tx = make(learning_rate=0.0)  # set per-epoch via hyperparams
    return tx


def _torch_sgd(momentum: float = 0.0, weight_decay: float = 0.0):
    @optax.inject_hyperparams
    def make(learning_rate):
        steps = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
        if momentum:
            steps.append(optax.trace(decay=momentum, nesterov=False))
        steps += [optax.scale(-1.0), optax.scale(learning_rate)]
        return optax.chain(*steps)
    return make(learning_rate=0.0)


def label_params(params: Dict[str, Any],
                 group_of: Callable[[str], str]) -> Dict[str, Any]:
    """Label each top-level param subtree with its optimizer group."""
    import jax
    return {k: jax.tree_util.tree_map(lambda _: group_of(k), v)
            for k, v in params.items()}


def _encoder_tx(args, tx):
    """With compat_frozen_text the reference's text params have grad=None and
    torch optimizers skip them entirely — freeze the group (zero grads alone
    would still pick up Adam weight decay)."""
    if getattr(args, "compat_frozen_text", False):
        return optax.set_to_zero()
    return tx


def make_stage1_bert_tx(args) -> optax.GradientTransformation:
    """heads-Adam(0.5, 0.999) / encoder-Adam(0.9, 0.999, wd) / cls-SGD(0.1,
    m=0.9, wd=5e-5) — reference: src/train_encoders_bert.py:212-222."""
    return optax.multi_transform(
        {
            "head": _torch_adam(0.5, 0.999),
            "encoder": _encoder_tx(args, _torch_adam(
                0.9, 0.999, weight_decay=args.weight_decay)),
            "cls": _torch_sgd(momentum=0.9, weight_decay=5e-5),
        },
        param_labels=lambda params: label_params(params, _stage1_group),
    )


def make_stage1_lstm_tx(args) -> optax.GradientTransformation:
    """reference: src/train_encoders_lstm.py:180-189 (encoder Adam betas
    (0.9, 0.5) with weight decay, head Adam (0.5, 0.999), cls SGD)."""
    return optax.multi_transform(
        {
            "head": _torch_adam(0.5, 0.999),
            "encoder": _encoder_tx(args, _torch_adam(
                0.9, 0.5, weight_decay=args.weight_decay)),
            "cls": _torch_sgd(momentum=0.9, weight_decay=5e-5),
        },
        param_labels=lambda params: label_params(params, _stage1_group),
    )


def make_stage2_tx(args) -> optax.GradientTransformation:
    """cls plain-SGD(lr_image_train, wd) / encoder Adam(1e-5, wd .01) /
    head Adam(lr_head, wd 5e-5) — reference: src/fusion_bert.py:118-141."""
    return optax.multi_transform(
        {
            "cls": _torch_sgd(momentum=0.0, weight_decay=args.weight_decay),
            "encoder": _encoder_tx(args, _torch_adam(0.9, 0.999,
                                                      weight_decay=0.01)),
            "head": _torch_adam(0.9, 0.999, weight_decay=5e-5),
        },
        param_labels=lambda params: label_params(params, _stage2_group),
    )


def _stage1_group(name: str) -> str:
    if name in ("text_encoder",):
        return "encoder"
    if name in ("image_cls", "text_cls"):
        return "cls"
    return "head"  # image_head, text_head, cmp


def _stage2_group(name: str) -> str:
    if name in ("text_encoder",):
        return "encoder"
    if name in ("metric_fc",):
        return "cls"
    return "head"  # text_head, image_head, fusion_net


def set_lr(opt_state, group: str, lr: float):
    """Return a new multi_transform state with one group's learning rate set
    (host-side, between epochs — mirrors the reference's scheduler.step()).

    Purely functional: rebuilds the NamedTuple spine via _replace instead of
    mutating optax internals in place (in-place dict mutation only works while
    optax happens to share the dict object across states)."""
    wrap = opt_state.inner_states[group]
    inner = wrap.inner_state
    if not hasattr(inner, "hyperparams"):  # frozen groups have no LR
        return opt_state
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_states = dict(opt_state.inner_states)
    new_states[group] = wrap._replace(inner_state=inner._replace(hyperparams=hp))
    return opt_state._replace(inner_states=new_states)


def get_lr(opt_state, group: str) -> float:
    return float(
        opt_state.inner_states[group].inner_state.hyperparams["learning_rate"])
