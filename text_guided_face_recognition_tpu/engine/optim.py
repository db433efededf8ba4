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


def _clip_global_norm(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics: scale = min(1, c/max(g,eps)).
    Under optax.flatten this is ONE norm + one multiply on the flat vector
    (vs ~2 ops per leaf when applied tree-wise in the train step)."""
    def update(updates, state, params=None):
        import jax
        gnorm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-6))
        return jax.tree_util.tree_map(lambda x: x * scale, updates), state
    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def _torch_adam(b1: float, b2: float, weight_decay: float = 0.0,
                eps: float = 1e-8, clip_norm: float = 0.0):
    """torch.optim.Adam equivalent with injectable lr. clip_norm > 0 prepends
    the reference's text-encoder grad clip (clip -> wd-add -> adam, matching
    torch clip-before-step order)."""
    @optax.inject_hyperparams
    def make(learning_rate):
        steps = [_clip_global_norm(clip_norm)] if clip_norm else []
        steps += [optax.add_decayed_weights(weight_decay)] if weight_decay else []
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


def _partition(tree: Dict[str, Any], group_of: Callable[[str], str]
               ) -> Dict[str, Dict[str, Any]]:
    out: Dict[str, Dict[str, Any]] = {}
    for k, v in tree.items():
        out.setdefault(group_of(k), {})[k] = v
    return out


def make_partitioned_flat_tx(group_txs: Dict[str, optax.GradientTransformation],
                             group_of: Callable[[str], str]
                             ) -> optax.GradientTransformation:
    """Fused alternative to optax.multi_transform: partition the top-level
    param dict into groups and run each group's transform over optax.flatten
    — all of a group's leaves become ONE 1-D vector, so the Adam/SGD chain is
    a handful of big fused vector ops instead of a per-leaf op soup (the
    profiled stage-1 step spends ~3 ms/step on ~2k tiny optimizer ops;
    elementwise updates are value-identical under flattening).

    State: plain dict {group: inner_state} (orbax-serializable).
    """
    groups = sorted(group_txs)
    # set_to_zero flattens harmlessly; flatten uniformly for one state shape
    flat_txs = {g: optax.flatten(tx) for g, tx in group_txs.items()}

    def init(params):
        parts = _partition(params, group_of)
        return {g: flat_txs[g].init(parts.get(g, {})) for g in groups}

    def update(updates, state, params=None):
        u_parts = _partition(updates, group_of)
        p_parts = _partition(params, group_of) if params is not None else {}
        merged: Dict[str, Any] = {}
        new_state = {}
        for g in groups:
            sub = u_parts.get(g)
            if not sub:
                new_state[g] = state[g]
                continue
            u, s = flat_txs[g].update(sub, state[g], p_parts.get(g))
            new_state[g] = s
            merged.update(u)
        return merged, new_state

    return optax.GradientTransformation(init, update)


def _grouped_tx(args, group_txs: Dict[str, optax.GradientTransformation],
                group_of: Callable[[str], str]) -> optax.GradientTransformation:
    """Dispatch on args.fused_optimizer: flattened per-group vector updates
    (fast path) vs optax.multi_transform over the labeled tree (reference
    shape; value-identical updates — tests/test_optim_fused.py)."""
    if getattr(args, "fused_optimizer", False):
        return make_partitioned_flat_tx(group_txs, group_of)
    return optax.multi_transform(
        group_txs,
        param_labels=lambda params: label_params(params, group_of))


def make_stage1_bert_tx(args) -> optax.GradientTransformation:
    """heads-Adam(0.5, 0.999) / encoder-Adam(0.9, 0.999, wd) / cls-SGD(0.1,
    m=0.9, wd=5e-5) — reference: src/train_encoders_bert.py:212-222."""
    return _grouped_tx(args, {
        "head": _torch_adam(0.5, 0.999),
        "encoder": _encoder_tx(args, _torch_adam(
            0.9, 0.999, weight_decay=args.weight_decay,
            clip_norm=float(getattr(args, "clip_max_norm", 0.0) or 0.0))),
        "cls": _torch_sgd(momentum=0.9, weight_decay=5e-5),
    }, _stage1_group)


def make_stage1_lstm_tx(args) -> optax.GradientTransformation:
    """reference: src/train_encoders_lstm.py:180-189 (encoder Adam betas
    (0.9, 0.5) with weight decay, head Adam (0.5, 0.999), cls SGD)."""
    return _grouped_tx(args, {
        "head": _torch_adam(0.5, 0.999),
        "encoder": _encoder_tx(args, _torch_adam(
            0.9, 0.5, weight_decay=args.weight_decay,
            clip_norm=float(getattr(args, "clip_max_norm", 0.0) or 0.0))),
        "cls": _torch_sgd(momentum=0.9, weight_decay=5e-5),
    }, _stage1_group)


def make_stage2_tx(args) -> optax.GradientTransformation:
    """cls plain-SGD(lr_image_train, wd) / encoder Adam(1e-5, wd .01) /
    head Adam(lr_head, wd 5e-5) — reference: src/fusion_bert.py:118-141."""
    return _grouped_tx(args, {
        "cls": _torch_sgd(momentum=0.0, weight_decay=args.weight_decay),
        "encoder": _encoder_tx(args, _torch_adam(0.9, 0.999,
                                                  weight_decay=0.01)),
        "head": _torch_adam(0.9, 0.999, weight_decay=5e-5),
    }, _stage2_group)


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
    """Return a new optimizer state with one group's learning rate set
    (host-side, between epochs — mirrors the reference's scheduler.step()).

    Handles both state shapes: optax.multi_transform (.inner_states[group])
    and the fused partitioned dict ({group: inner_state}). Purely functional:
    rebuilds the NamedTuple spine via _replace instead of mutating optax
    internals in place."""
    if isinstance(opt_state, dict):  # fused partitioned state
        inner = opt_state[group]
        if not hasattr(inner, "hyperparams"):  # frozen groups have no LR
            return opt_state
        hp = dict(inner.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        new = dict(opt_state)
        new[group] = inner._replace(hyperparams=hp)
        return new
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
    if isinstance(opt_state, dict):  # fused partitioned state
        return float(opt_state[group].hyperparams["learning_rate"])
    return float(
        opt_state.inner_states[group].inner_state.hyperparams["learning_rate"])
