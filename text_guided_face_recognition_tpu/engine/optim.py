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

import functools

from typing import Any, Callable, Dict

import jax.numpy as jnp
import optax

__all__ = ["make_stage1_bert_tx", "make_stage1_lstm_tx", "make_stage2_tx",
           "label_params", "cast_grads"]


def _clip_global_norm(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics: scale = min(1, c/max(g,eps)).
    Under optax.flatten this is ONE norm + one multiply on the flat vector
    (vs ~2 ops per leaf when applied tree-wise in the train step).

    The squared-norm accumulates in fp32 regardless of the grad-leaf dtype
    (the convert fuses into the reduce): with `grads_dtype: bfloat16` a
    naive optax.global_norm would sum 110M squares in bf16 and lose the
    norm to rounding. The scale is applied in each leaf's own dtype so
    clipping never re-materializes a wider grad tree."""
    def update(updates, state, params=None):
        import jax
        sq = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                 for x in jax.tree_util.tree_leaves(updates))
        gnorm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-6))
        return jax.tree_util.tree_map(
            lambda x: x * scale.astype(x.dtype), updates), state
    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def cast_grads(grads, dtype: str):
    """Cast every inexact grad leaf to `dtype` at the jax.grad boundary
    (config `grads_dtype`, default measured in docs/BENCHMARKS.md).

    Under jit the converts fuse into the grad-producing kernels (dW GEMM
    epilogues), so with bfloat16 the fp32 gradient tree never reaches HBM:
    dW writes, the clip-norm read pass, and the Adam grad reads all halve
    (~1.3 GB/step -> ~0.66 GB over the ~110M-param text tower). Adam moment
    math still accumulates in fp32 (_scale_by_adam_cast casts per element
    inside the fused update). No-op for "float32"."""
    import jax
    if not dtype or jnp.dtype(dtype) == jnp.float32:
        return grads
    dt = jnp.dtype(dtype)
    return jax.tree_util.tree_map(
        lambda g: g.astype(dt) if jnp.issubdtype(g.dtype, jnp.inexact) else g,
        grads)


def _scale_by_adam_cast(b1: float, b2: float, eps: float,
                        moment_dtype) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments stored in `moment_dtype`
    (compute still fp32). With bfloat16 this halves the optimizer-state HBM
    traffic — the profiled stage-1 step moves ~1.8 GB/step of fp32 moment
    reads+writes over ~110M params, and the Adam update is bandwidth-bound.
    Value impact: bf16 moment rounding (~3 sig. digits) on a normalized
    update; the learning-trajectory A/B is in docs/BENCHMARKS.md."""
    import jax

    md = jnp.dtype(moment_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=md)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - jnp.asarray(b1, jnp.float32) ** count
        c2 = 1.0 - jnp.asarray(b2, jnp.float32) ** count

        def one(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            out = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            return out.astype(g.dtype), m32.astype(md), v32.astype(md)

        trip = jax.tree_util.tree_map(one, updates, state.mu, state.nu)
        outer = jax.tree_util.tree_structure(updates)
        out, mu, nu = (jax.tree_util.tree_transpose(
            outer, jax.tree_util.tree_structure((0, 0, 0)), trip))
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


EMB_MIN_ROWS = 8192  # 2-D leaves with >= this many rows count as embedding tables


def _emb_leaf(p, min_rows: int = None) -> bool:
    min_rows = EMB_MIN_ROWS if min_rows is None else min_rows
    return getattr(p, "ndim", 0) == 2 and p.shape[0] >= min_rows


def _lazy_row_update(g, m, v, p, b1, b2, eps, c1, c2, wd, md, max_rows: int):
    """Row-sparse (TF-LazyAdam-style) Adam step for one embedding-table leaf.

    Only rows with a nonzero gradient this step (the tokens appearing in the
    batch — a static top_k of at most `max_rows` rows, sized B*T by the
    caller) have their Adam moments advanced and receive a parameter delta;
    every other row of the 30522x768-class table keeps params AND moments
    bit-unchanged. This deviates from dense torch Adam, where stale momentum
    and weight decay keep moving untouched rows every step (DEVIATIONS #20);
    weight decay is applied per touched row here. Motivation: the profiled
    dense embedding-table Adam moves ~0.5 GB/step of moment/param HBM traffic
    for ~768 actually-touched rows (docs/BENCHMARKS.md)."""
    import jax
    f32 = jnp.float32
    k = int(min(max_rows, g.shape[0]))
    rowsq = jnp.sum(jnp.square(g.astype(f32)), axis=1)
    _, idx = jax.lax.top_k(rowsq, k)  # touched rows first; indices unique
    touched = (rowsq[idx] > 0.0).astype(f32)[:, None]
    gk = g[idx].astype(f32)
    if wd:
        gk = gk + wd * p[idx].astype(f32)
    mk, vk = m[idx].astype(f32), v[idx].astype(f32)
    mk2 = b1 * mk + (1.0 - b1) * gk
    vk2 = b2 * vk + (1.0 - b2) * gk * gk
    outk = (mk2 / c1) / (jnp.sqrt(vk2 / c2) + eps)
    # rows top_k selected beyond the touched set keep old moments, zero update
    mk2 = touched * mk2 + (1.0 - touched) * mk
    vk2 = touched * vk2 + (1.0 - touched) * vk
    outk = outk * touched
    new_m = m.at[idx].set(mk2.astype(md))
    new_v = v.at[idx].set(vk2.astype(md))
    out = jnp.zeros(g.shape, g.dtype).at[idx].set(outk.astype(g.dtype))
    return out, new_m, new_v


def _scale_by_adam_mixed(b1: float, b2: float, eps: float, moment_dtype,
                         weight_decay: float,
                         emb_max_rows: int) -> optax.GradientTransformation:
    """Adam with per-leaf dispatch: embedding-table leaves (_emb_leaf) get the
    row-sparse lazy update (incl. their weight decay, touched rows only);
    every other leaf gets the standard dense update in `moment_dtype` storage.
    Dense leaves' weight decay must be added UPSTREAM by a masked
    add_decayed_weights (see _torch_adam) so it is not applied twice."""
    import jax

    md = jnp.dtype(moment_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=md)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lazy_embedding_adam requires params in update()")
        count = state.count + 1
        c1 = 1.0 - jnp.asarray(b1, jnp.float32) ** count
        c2 = 1.0 - jnp.asarray(b2, jnp.float32) ** count

        def one(g, m, v, p):
            if _emb_leaf(g):
                return _lazy_row_update(g, m, v, p, b1, b2, eps, c1, c2,
                                        weight_decay, md, emb_max_rows)
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            out = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            return out.astype(g.dtype), m32.astype(md), v32.astype(md)

        trip = jax.tree_util.tree_map(one, updates, state.mu, state.nu, params)
        outer = jax.tree_util.tree_structure(updates)
        out, mu, nu = (jax.tree_util.tree_transpose(
            outer, jax.tree_util.tree_structure((0, 0, 0)), trip))
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _torch_adam(b1: float, b2: float, weight_decay: float = 0.0,
                eps: float = 1e-8, clip_norm: float = 0.0,
                moment_dtype: str = "float32", lazy_emb_rows: int = 0):
    """torch.optim.Adam equivalent with injectable lr. clip_norm > 0 prepends
    the reference's text-encoder grad clip (clip -> wd-add -> adam, matching
    torch clip-before-step order). moment_dtype != float32 stores the Adam
    moments reduced-precision (_scale_by_adam_cast). lazy_emb_rows > 0 routes
    embedding-table leaves through the row-sparse lazy update (and excludes
    them from the dense weight-decay add — theirs happens per touched row)."""
    # hyperparam_dtype pinned: inject_hyperparams otherwise re-emits the
    # lr state in the update dtype, which flips it to bf16 under
    # grads_dtype=bfloat16 and breaks while_loop carry typing in benches.
    @functools.partial(optax.inject_hyperparams,
                       hyperparam_dtype=jnp.float32)
    def make(learning_rate):
        import jax
        steps = [_clip_global_norm(clip_norm)] if clip_norm else []
        if lazy_emb_rows:
            if weight_decay:
                steps += [optax.masked(
                    optax.add_decayed_weights(weight_decay),
                    lambda params: jax.tree_util.tree_map(
                        lambda p: not _emb_leaf(p), params))]
            adam = _scale_by_adam_mixed(b1, b2, eps, moment_dtype,
                                        weight_decay, lazy_emb_rows)
        else:
            steps += ([optax.add_decayed_weights(weight_decay)]
                      if weight_decay else [])
            if jnp.dtype(moment_dtype) == jnp.float32:
                adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
            else:
                adam = _scale_by_adam_cast(b1, b2, eps, moment_dtype)
        steps += [adam, optax.scale(-1.0)]
        return optax.chain(*steps, optax.scale(learning_rate))
    tx = make(learning_rate=0.0)  # set per-epoch via hyperparams
    return tx


def _torch_sgd(momentum: float = 0.0, weight_decay: float = 0.0):
    @functools.partial(optax.inject_hyperparams,
                       hyperparam_dtype=jnp.float32)
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
                # optax.multi_transform always steps every group (Adam step
                # counts advance even on zero grads); silently freezing a
                # group here would be a latent divergence — fail loudly.
                raise ValueError(
                    f"gradient tree is missing optimizer group {g!r}: "
                    f"updates must cover every top-level param key "
                    f"(got groups {sorted(u_parts)})")
            u, s = flat_txs[g].update(sub, state[g], p_parts.get(g))
            new_state[g] = s
            merged.update(u)
        return merged, new_state

    return optax.GradientTransformation(init, update)


def _bucket_key(x, i: int, max_elems: int) -> str:
    if max_elems and x.size > max_elems:
        return f"leaf{i}"  # too big to stack: its own singleton bucket
    # Shape-only key: the UPDATES tree may arrive in a narrower dtype than
    # the params the state was init'ed from (grads_dtype: bfloat16), and
    # dtype-qualified keys would mismatch the stacked optimizer state.
    # _stack_tree asserts each bucket is dtype-homogeneous.
    return f"s{tuple(x.shape)}"


def _bucket_leaves(tree, max_elems: int = 0):
    """Deterministic same-(shape,dtype) bucketing of a tree's leaves.
    Returns (treedef, leaves, buckets) with buckets = ordered
    {name: [leaf indices]} — recomputable from any same-structured tree, so
    it never lives in optimizer state. max_elems > 0 exempts leaves larger
    than that from stacking (each keeps a singleton bucket)."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    buckets: Dict[str, list] = {}
    for i, x in enumerate(leaves):
        buckets.setdefault(_bucket_key(x, i, max_elems), []).append(i)
    return treedef, leaves, dict(sorted(buckets.items()))


def _stack_tree(tree, max_elems: int = 0) -> Dict[str, Any]:
    """{bucket_name: stacked array (or the lone leaf for singletons)}."""
    _, leaves, buckets = _bucket_leaves(tree, max_elems)
    out = {}
    for name, idxs in buckets.items():
        if len(idxs) == 1:
            out[name] = leaves[idxs[0]]
        else:
            dts = {jnp.result_type(leaves[i]).name for i in idxs}
            if len(dts) > 1:  # shape-only keys must never mix dtypes
                raise ValueError(f"stacked-optimizer bucket {name} mixes "
                                 f"dtypes {sorted(dts)}")
            out[name] = jnp.stack([leaves[i] for i in idxs])
    return out


def _unstack_tree(stacked: Dict[str, Any], like, max_elems: int = 0) -> Any:
    import jax
    treedef, leaves, buckets = _bucket_leaves(like, max_elems)
    out = [None] * len(leaves)
    for name, idxs in buckets.items():
        if len(idxs) == 1:
            out[idxs[0]] = stacked[name]
        else:
            arr = stacked[name]
            for j, i in enumerate(idxs):
                out[i] = arr[j]
    return jax.tree_util.tree_unflatten(treedef, out)


def make_stacked_group_tx(group_txs: Dict[str, optax.GradientTransformation],
                          group_of: Callable[[str], str],
                          max_elems: int = 0
                          ) -> optax.GradientTransformation:
    """Same-shape leaf-group STACKED optimizer (the r3 step-time remedy).

    Within each optimizer group, leaves of identical (shape, dtype) — e.g.
    the 12 transformer layers' qkv kernels, biases, layernorm scales — are
    jnp.stack'ed into one array and the group's Adam/SGD chain runs once per
    shape-bucket instead of once per leaf. Elementwise updates are
    value-identical under stacking (and the encoder chain's global-norm clip
    is bucket-invariant: ||stack(xs)|| == ||concat(xs)||).

    Contrast with the two measured rejects (docs/BENCHMARKS.md): this is NOT
    optax.flatten (no ravel/relayout of mixed shapes into one vector — that
    lost 2x to relayout copies) and NOT nn.scan (the forward/backward stay
    unrolled; only the optimizer update is stacked). Motivation (r3 profile):
    the per-leaf update soup emits ~50 tiny fp32 buffers whose VMEM<->HBM
    copy stalls cost ~3.7 ms/step at B=32.

    State: {group: inner_state} over the stacked representation
    (orbax-serializable; set_lr/get_lr handle it via the dict path).
    """
    groups = sorted(group_txs)

    def init(params):
        parts = _partition(params, group_of)
        return {g: group_txs[g].init(
                    _stack_tree(parts.get(g, {}), max_elems))
                for g in groups}

    def update(updates, state, params=None):
        import jax
        u_parts = _partition(updates, group_of)
        p_parts = _partition(params, group_of) if params is not None else {}
        merged: Dict[str, Any] = {}
        new_state = {}
        for g in groups:
            sub = u_parts.get(g)
            if not sub:
                raise ValueError(
                    f"gradient tree is missing optimizer group {g!r}: "
                    f"updates must cover every top-level param key "
                    f"(got groups {sorted(u_parts)})")
            sp = (_stack_tree(p_parts[g], max_elems)
                  if g in p_parts else None)
            u, s = group_txs[g].update(_stack_tree(sub, max_elems),
                                       state[g], sp)
            new_state[g] = s
            merged.update(_unstack_tree(u, sub, max_elems))
        return merged, new_state

    return optax.GradientTransformation(init, update)


def _grouped_tx(args, group_txs: Dict[str, optax.GradientTransformation],
                group_of: Callable[[str], str]) -> optax.GradientTransformation:
    """Dispatch on args.{stacked,fused}_optimizer: shape-bucket stacked
    updates / flattened per-group vector updates / optax.multi_transform over
    the labeled tree (reference shape; all value-identical —
    tests/test_optim_fused.py)."""
    if getattr(args, "stacked_optimizer", False):
        return make_stacked_group_tx(
            group_txs, group_of,
            max_elems=int(getattr(args, "stack_max_elems", 0) or 0))
    if getattr(args, "fused_optimizer", False):
        return make_partitioned_flat_tx(group_txs, group_of)
    return optax.multi_transform(
        group_txs,
        param_labels=lambda params: label_params(params, group_of))


def _moments_dtype(args) -> str:
    return str(getattr(args, "adam_moments_dtype", "float32") or "float32")


def _lazy_rows(args, words_field: str) -> int:
    """Static touched-row bound for the lazy embedding update: at most B*T
    distinct token ids appear per batch. 0 disables (dense Adam)."""
    if not getattr(args, "lazy_embedding_adam", False):
        return 0
    t = int(getattr(args, words_field, 0) or 24)
    return max(256, int(args.batch_size) * t)



def _effective_clip(args) -> float:
    """Reference BEHAVIOR is no clipping: clip_grad_norm_ runs AFTER the
    optimizer steps in both stage-1 trainers (reference
    src/train_encoders_bert.py:323-331, src/train_encoders_lstm.py:303-309)
    — a no-op on already-consumed grads (DEVIATIONS #3). Default honors
    that (and skips the ~1.25 ms/step whole-tree norm pass the clip costs
    at B=32, docs/BENCHMARKS.md); `apply_grad_clip: true` restores the
    comment's stated *intent* (pre-step clip by clip_max_norm)."""
    if not getattr(args, "apply_grad_clip", False):
        return 0.0
    return float(getattr(args, "clip_max_norm", 0.0) or 0.0)


def make_stage1_bert_tx(args) -> optax.GradientTransformation:
    """heads-Adam(0.5, 0.999) / encoder-Adam(0.9, 0.999, wd) / cls-SGD(0.1,
    m=0.9, wd=5e-5) — reference: src/train_encoders_bert.py:212-222."""
    md = _moments_dtype(args)
    return _grouped_tx(args, {
        "head": _torch_adam(0.5, 0.999, moment_dtype=md),
        "encoder": _encoder_tx(args, _torch_adam(
            0.9, 0.999, weight_decay=args.weight_decay,
            clip_norm=_effective_clip(args),
            moment_dtype=md,
            lazy_emb_rows=_lazy_rows(args, "bert_words_num"))),
        "cls": _torch_sgd(momentum=0.9, weight_decay=5e-5),
    }, _stage1_group)


def make_stage1_lstm_tx(args) -> optax.GradientTransformation:
    """reference: src/train_encoders_lstm.py:180-189 (encoder Adam betas
    (0.9, 0.5) with weight decay, head Adam (0.5, 0.999), cls SGD)."""
    md = _moments_dtype(args)
    return _grouped_tx(args, {
        "head": _torch_adam(0.5, 0.999, moment_dtype=md),
        "encoder": _encoder_tx(args, _torch_adam(
            0.9, 0.5, weight_decay=args.weight_decay,
            clip_norm=_effective_clip(args),
            moment_dtype=md,
            lazy_emb_rows=_lazy_rows(args, "lstm_words_num"))),
        "cls": _torch_sgd(momentum=0.9, weight_decay=5e-5),
    }, _stage1_group)


def make_stage2_tx(args) -> optax.GradientTransformation:
    """cls plain-SGD(lr_image_train, wd) / encoder Adam(1e-5, wd .01) /
    head Adam(lr_head, wd 5e-5) — reference: src/fusion_bert.py:118-141."""
    md = _moments_dtype(args)
    words_field = ("bert_words_num"
                   if str(getattr(args, "en_type", "BERT")).upper() == "BERT"
                   else "lstm_words_num")
    return _grouped_tx(args, {
        "cls": _torch_sgd(momentum=0.0, weight_decay=args.weight_decay),
        "encoder": _encoder_tx(args, _torch_adam(
            0.9, 0.999, weight_decay=0.01, moment_dtype=md,
            lazy_emb_rows=_lazy_rows(args, words_field))),
        "head": _torch_adam(0.9, 0.999, weight_decay=5e-5, moment_dtype=md),
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


# --------------------------------------------------- legacy-state migration --


def _walk_states(node, typename: str, out: list) -> None:
    """Collect every namedtuple node whose type name is `typename`
    (depth-first; optax states are namedtuples over dicts/tuples)."""
    if hasattr(node, "_fields"):
        if type(node).__name__ == typename:
            out.append(node)
        for f in node._fields:
            _walk_states(getattr(node, f), typename, out)
    elif isinstance(node, dict):
        for v in node.values():
            _walk_states(v, typename, out)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _walk_states(v, typename, out)


def _find_one(node, typename: str):
    found: list = []
    _walk_states(node, typename, found)
    if len(found) > 1:
        raise ValueError(f"expected at most one {typename} per optimizer "
                         f"group, found {len(found)}")
    return found[0] if found else None


def _rebuild_states(node, fixes: Dict[str, Callable[[Any], Any]]):
    """Functionally rebuild a state tree, applying fixes[typename] to each
    matching namedtuple node (children first)."""
    if hasattr(node, "_fields"):
        new = type(node)(**{f: _rebuild_states(getattr(node, f), fixes)
                            for f in node._fields})
        fix = fixes.get(type(node).__name__)
        return fix(new) if fix else new
    if isinstance(node, dict):
        return {k: _rebuild_states(v, fixes) for k, v in node.items()}
    if isinstance(node, tuple):
        return tuple(_rebuild_states(v, fixes) for v in node)
    if isinstance(node, list):
        return [_rebuild_states(v, fixes) for v in node]
    return node


def _refit_leaves(legacy_tree, fresh_tree, group_params, max_elems: int):
    """Re-layout a legacy per-leaf moment/trace tree onto the fresh state's
    representation (per-leaf masked tree OR stacked bucket dict), casting
    each leaf to the fresh dtype (fp32 -> bf16 moments)."""
    import jax
    tu = jax.tree_util
    legacy_leaves = tu.tree_leaves(legacy_tree)  # MaskedNodes have no leaves
    # If the fresh state is the stacked bucket layout, its structure equals
    # _stack_tree over the group's params: rebuild the per-leaf tree and
    # stack it with the same bucket rule (bucket dicts are name-sorted, so
    # leaf-count equality alone would mismap singleton buckets).
    per_leaf = tu.tree_unflatten(tu.tree_structure(group_params),
                                 legacy_leaves)
    stacked = _stack_tree(per_leaf, max_elems)
    if tu.tree_structure(fresh_tree) == tu.tree_structure(stacked):
        return jax.tree_util.tree_map(
            lambda f, s: jnp.asarray(s, f.dtype), fresh_tree, stacked)
    # per-leaf fresh layout (multi_transform masked tree): same full-tree
    # leaf order as the legacy masked tree
    fresh_leaves = tu.tree_leaves(fresh_tree)
    if len(fresh_leaves) != len(legacy_leaves):
        raise ValueError(
            f"cannot refit moment tree: {len(legacy_leaves)} legacy leaves "
            f"vs {len(fresh_leaves)} target leaves")
    return tu.tree_unflatten(
        tu.tree_structure(fresh_tree),
        [jnp.asarray(l, f.dtype)
         for f, l in zip(fresh_leaves, legacy_leaves)])


def legacy_tx_variants(args, tx_maker) -> list:
    """The optimizer-state formats this repo has shipped, for resume
    migration (DEVIATIONS #21): r1/r2 checkpoints hold per-leaf
    optax.multi_transform state with fp32 Adam moments (grad clip on by
    default in r2, off in early r1 experiments)."""
    out = []
    for clip in (True, False):
        la = args.replace(stacked_optimizer=False, fused_optimizer=False,
                          lazy_embedding_adam=False,
                          adam_moments_dtype="float32",
                          apply_grad_clip=clip)
        out.append((f"r2-multi_transform(clip={'on' if clip else 'off'})",
                    tx_maker(la)))
    return out


def convert_legacy_opt_state(legacy, fresh, params,
                             group_of: Callable[[str], str],
                             max_elems: int):
    """Carry a restored legacy optimizer state (per-leaf multi_transform
    layout) into the CURRENT state format `fresh` (= tx.init(params) under
    today's config): per-group learning rates, Adam/inject step counts, Adam
    moments (re-stacked + recast as needed), and SGD momentum traces all
    transfer; everything else keeps the fresh initialization."""
    import jax

    def group_states(state):
        if isinstance(state, dict):                      # stacked/fused
            return dict(state)
        return {g: w.inner_state if type(w).__name__ == "MaskedState" else w
                for g, w in state.inner_states.items()}  # multi_transform

    legacy_groups = group_states(legacy)
    fresh_groups = group_states(fresh)
    if set(legacy_groups) != set(fresh_groups):
        raise ValueError(f"optimizer groups differ: legacy "
                         f"{sorted(legacy_groups)} vs {sorted(fresh_groups)}")
    parts = _partition(params, group_of)

    new_groups = {}
    for g, lg in legacy_groups.items():
        fg = fresh_groups[g]
        # optax names the inject_hyperparams state either
        # InjectHyperparamsState or InjectStatefulHyperparamsState
        # depending on version/statefulness — match both.
        inj_names = ("InjectHyperparamsState",
                     "InjectStatefulHyperparamsState")
        l_inj = next((s for n in inj_names
                      if (s := _find_one(lg, n)) is not None), None)
        l_adam = _find_one(lg, "ScaleByAdamState")
        l_trace = _find_one(lg, "TraceState")
        fixes: Dict[str, Callable[[Any], Any]] = {}
        if l_inj is not None:
            def fix_inj(n, l=l_inj):
                hp = dict(n.hyperparams)
                hp["learning_rate"] = jnp.asarray(
                    l.hyperparams["learning_rate"], jnp.float32)
                return n._replace(count=jnp.asarray(l.count, n.count.dtype),
                                  hyperparams=hp)
            for nm in inj_names:
                fixes[nm] = fix_inj
        if l_adam is not None:
            def fix_adam(n, l=l_adam, gp=parts.get(g, {})):
                return n._replace(
                    count=jnp.asarray(l.count, n.count.dtype),
                    mu=_refit_leaves(l.mu, n.mu, gp, max_elems),
                    nu=_refit_leaves(l.nu, n.nu, gp, max_elems))
            fixes["ScaleByAdamState"] = fix_adam
        if l_trace is not None:
            def fix_trace(n, l=l_trace, gp=parts.get(g, {})):
                return n._replace(
                    trace=_refit_leaves(l.trace, n.trace, gp, max_elems))
            fixes["TraceState"] = fix_trace
        new_groups[g] = _rebuild_states(fg, fixes)

    if isinstance(fresh, dict):
        return new_groups
    wrapped = {g: (w._replace(inner_state=new_groups[g])
                   if type(w).__name__ == "MaskedState" else new_groups[g])
               for g, w in fresh.inner_states.items()}
    return fresh._replace(inner_states=wrapped)


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
