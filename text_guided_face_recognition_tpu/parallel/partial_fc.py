"""Class-sharded (partial-FC-style) margin classifier over the device mesh.

The reference's stage-2 margin head is a dense (num_classes, 640) ArcFace
classifier replicated per GPU by nn.DataParallel (reference:
src/fusion_bert.py:105-115, models/metrics.py:17-60). On TPU pods the
classifier — not the towers — is what outgrows a chip first (real face
corpora have 10⁴-10⁶ identities; W and its optimizer state scale linearly
with them), so the TPU-native formulation shards the CLASS axis over the
mesh and keeps the softmax exact with a distributed log-sum-exp:

  * W rows sharded P("data", None): each device owns C/N classes (and their
    optimizer state — here plain SGD, reference src/fusion_bert.py:118-124)
  * fused embeddings all_gather'ed over ICI (tiny: B x 640 floats/step)
  * each device computes its (B, C/N) cosine/margin logit block — the margin
    applies only where the target class falls in the local row range
  * softmax statistics (row max, sum-exp, target logit) are combined with
    pmax/psum over the axis, so every device evaluates the IDENTICAL
    full-class cross-entropy; autodiff through the collectives yields exact
    full-batch gradients (tower grads via the all_gather transpose + psum,
    W-shard grads purely local — no collective at all)

This is the insightface "partial FC" scheme without its negative-class
sampling: sampling is an accuracy-affecting approximation, while the
distributed LSE is EXACT — value- and gradient-identical to the dense head
(tests/test_partial_fc.py proves both on the 8-device CPU mesh). Memory per
device drops from O(C·D) to O(C·D/N) for W + optimizer state and from
O(B·C) to O(B·C/N) for the logit block, which is what unlocks million-ID
training; compute per device likewise drops N-fold while the only
communication is the feature gather plus three (B,)-sized reductions.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from text_guided_face_recognition_tpu.engine import optim
from text_guided_face_recognition_tpu.engine.stage1 import TrainState

__all__ = [
    "sharded_margin_ce",
    "classifier_specs_for_state",
    "shard_state_for_partial_fc",
    "make_partial_fc_fusion_step",
]

_NEG_INF = -1.0e30  # exp(x - rowmax) underflows to exactly 0.0 in fp32


def sharded_margin_ce(
    emb_local: jnp.ndarray,
    w_local: jnp.ndarray,
    label_local: jnp.ndarray,
    axis: str,
    *,
    head: str = "arcface",
    s: float = 30.0,
    m: float = 0.5,
    easy_margin: bool = False,
    loss_kind: str = "ce",
    gamma: float = 2.0,
    num_classes: int | None = None,
) -> jnp.ndarray:
    """Exact margin-softmax cross-entropy with W class-sharded over `axis`.

    Per-shard function (call inside shard_map / under an axis binding):
      emb_local   (B/N, D)  — this shard's batch rows
      w_local     (C/N, D)  — this shard's class rows (torch F.linear layout,
                              matching ops.margins.normalized_cosine)
      label_local (B/N,)    — GLOBAL class ids for the local rows
      num_classes           — true class count; when the padded global C
                              (N * C/N) exceeds it, the padded columns are
                              masked out of the softmax (their W rows get
                              zero gradient)

    head: "arcface" (cos(θ+m), reference models/metrics.py:17-60) or
    "cosface" (cosθ - m, models/metrics.py:63-102). loss_kind: "ce" (torch
    nn.CrossEntropyLoss) or "focal" (the reference's batch-mean-quirk focal,
    models/losses.py:313-325 — ops.losses.focal_loss).

    Returns the REPLICATED scalar loss over the full global batch — identical
    on every shard, and value/grad-identical to
    ops.margins.*_margin_logits + ops.losses.cross_entropy_rows on the
    unsharded arrays (tests/test_partial_fc.py).
    """
    # gather the batch over ICI: B x D floats — tiny next to the C/N x D GEMM
    emb = jax.lax.all_gather(emb_local, axis, axis=0, tiled=True)
    label = jax.lax.all_gather(label_local, axis, axis=0, tiled=True)

    e = emb.astype(jnp.float32)
    w = w_local.astype(jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
    cosine = e @ w.T  # (B, C/N) local logit block

    c_loc = w_local.shape[0]
    offset = jax.lax.axis_index(axis) * c_loc
    loc = label - offset
    in_range = (loc >= 0) & (loc < c_loc)
    # one_hot of -1 is the all-zero row: shards not owning the target class
    # apply no margin and contribute no target logit
    one_hot = jax.nn.one_hot(jnp.where(in_range, loc, -1), c_loc,
                             dtype=cosine.dtype)

    if head == "arcface":
        # 1e-12 floor, not 0: sqrt'(0)=inf emits 0*inf=NaN in the backward
        # when a target cosine saturates at +-1 (ops/margins.py has the
        # full story + regression test)
        sine = jnp.sqrt(jnp.clip(1.0 - jnp.square(cosine), 1e-12, 1.0))
        phi = cosine * math.cos(m) - sine * math.sin(m)
        if easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            th = math.cos(math.pi - m)
            mm = math.sin(math.pi - m) * m
            phi = jnp.where(cosine > th, phi, cosine - mm)
    elif head == "cosface":
        phi = cosine - m
    else:
        raise ValueError(f"unsupported sharded margin head {head!r}")
    logits = (one_hot * phi + (1.0 - one_hot) * cosine) * s

    if num_classes is not None and num_classes < 0:
        raise ValueError("num_classes must be >= 0")
    if num_classes is not None:
        # mask padded class columns out of the softmax (static no-op when the
        # global C already equals num_classes — jnp.where still traces, so
        # only emit it when padding can exist)
        col = offset + jnp.arange(c_loc)
        logits = jnp.where(col[None, :] < num_classes, logits, _NEG_INF)

    # distributed log-sum-exp: the shift by the global row max is exact
    # (LSE is shift-invariant, so stop_gradient loses nothing) and keeps
    # exp() in range. Per-shard maxima are combined via all_gather+max
    # rather than pmax — pmax has no autodiff rule even on the stopped
    # branch, while all_gather differentiates (its transpose feeds the
    # tower grads anyway); the extra bytes are (N, B) floats.
    m_loc = jnp.max(jax.lax.stop_gradient(logits), axis=1)
    row_max = jnp.max(jax.lax.all_gather(m_loc, axis, axis=0), axis=0)
    z = jnp.exp(logits - row_max[:, None])
    denom = jax.lax.psum(jnp.sum(z, axis=1), axis)
    target = jax.lax.psum(jnp.sum(one_hot * logits, axis=1), axis)
    nll = jnp.log(denom) + row_max - target  # (B,) full-class CE per row
    ce = jnp.mean(nll)

    if loss_kind == "focal":
        # reference quirk preserved: (1-p)^gamma applied to the BATCH-MEAN
        # CE, not per-sample (ops.losses.focal_loss)
        p = jnp.exp(-ce)
        return (1.0 - p) ** gamma * ce
    if loss_kind != "ce":
        raise ValueError(f"unsupported loss_kind {loss_kind!r}")
    return ce


_CLS_PATH_KEYS = ("metric_fc", "cls")


def _is_classifier_leaf(path, leaf: Any, shape: tuple) -> bool:
    if getattr(leaf, "ndim", 0) != 2 or tuple(leaf.shape) != shape:
        return False
    # exact-key path gate: the metric_fc param subtree, or anything inside
    # the 'cls' optimizer group (whose stacked/fused state modes re-key
    # leaves by shape bucket, erasing the 'metric_fc' name). Shape alone is
    # not enough — a stacked bucket of k (d,)-leaves elsewhere could
    # coincidentally stack to (num_classes, feat).
    return any(getattr(entry, "key", None) in _CLS_PATH_KEYS
               for entry in path)


def classifier_specs_for_state(state: TrainState, axis: str,
                               classifier_shape: Sequence[int]):
    """PartitionSpec tree for a TrainState: every 2-D leaf of shape
    `classifier_shape` (the (num_classes, feat) metric_fc weight — and any
    same-shaped state the cls optimizer group ever carries) whose tree path
    passes through the 'metric_fc' or 'cls' key gets P(axis, None);
    everything else is replicated P()."""
    shape = tuple(classifier_shape)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: P(axis, None)
        if _is_classifier_leaf(path, leaf, shape) else P(),
        state)


def shard_state_for_partial_fc(state: TrainState, mesh: Mesh, axis: str,
                               classifier_shape: Sequence[int]) -> TrainState:
    """device_put the state with the classifier leaves sharded over `axis`
    (rows split across devices) and everything else replicated. Leaves stay
    global jax.Arrays, so checkpointing (engine/checkpoint.py) sees the same
    tree it would for the replicated layout."""
    specs = classifier_specs_for_state(state, axis, classifier_shape)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        state, specs)


def make_partial_fc_fusion_step(trainer, mesh: Mesh, axis: str = "data"):
    """Stage-2 train step with the metric_fc classifier class-sharded.

    Returns step(state, batch, frozen_vars, rng) with trainer._train_step's
    signature; `state` must come from shard_state_for_partial_fc (classifier
    rows split over `axis`) and batch arrays shard on their leading axis.
    num_classes must divide mesh.shape[axis] — pad `num_classes` in the
    config otherwise (sharded_margin_ce masks padded columns exactly, but
    this constructor keeps the state layout trivial by requiring
    divisibility).

    Collective schedule: features all_gather'ed (sharded_margin_ce), tower
    grads psum'd (each shard's grad covers its local rows' contributions via
    the gather's transpose), metric_fc grads purely LOCAL — each shard's
    w-block gradient is already the exact full-batch gradient for the rows it
    owns, so the classifier never touches the interconnect. The cls optimizer
    group is the reference's stateless-per-element SGD
    (src/fusion_bert.py:118-124), which commutes with row sharding.
    """
    args = trainer.args
    n = mesh.shape[axis]
    c = int(args.num_classes)
    if c % n:
        raise ValueError(
            f"partial-FC requires num_classes ({c}) divisible by the mesh "
            f"axis size ({n}); pad num_classes in the config — "
            f"sharded_margin_ce(num_classes=...) masks the padded columns")
    embed_fn = trainer.build_embed_fn()
    use_focal = args.model_type == "arcface" and args.loss == "focal_loss"
    cls_shape = (c, int(args.fusion_final_dim))

    def per_shard(state: TrainState, batch, frozen_vars, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params, batch_stats):
            output, new_stats = embed_fn(params, batch_stats, batch,
                                         frozen_vars, rng)
            loss = sharded_margin_ce(
                output, params["metric_fc"]["weight"],
                batch["cls_id"].astype(jnp.int32), axis,
                head="arcface", s=30.0, m=0.5,
                easy_margin=args.easy_margin,
                loss_kind="focal" if use_focal else "ce")
            return loss, (new_stats, {"loss": loss})

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(state.params,
                                                   state.batch_stats)
        grads = optim.cast_grads(grads,
                                 getattr(args, "grads_dtype", "float32"))
        # metric_fc rows are per-shard parameters: their local grad is the
        # complete full-batch gradient already (the psum inside the loss
        # routed every shard's cotangent contribution here); psum/pmean
        # would be wrong (different parameters per shard)
        grads = {k: (v if k == "metric_fc" else jax.lax.psum(v, axis))
                 for k, v in grads.items()}
        updates, new_opt = trainer.tx.update(grads, state.opt_state,
                                             state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_stats = jax.lax.pmean(new_stats, axis)
        # metrics are computed on the full global batch — already replicated
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1), metrics

    state_specs = classifier_specs_for_state(trainer.state, axis, cls_shape)
    step = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_specs, P(axis), P(), P()),
        out_specs=(state_specs, P()),
        check_vma=False)
    return jax.jit(step, donate_argnums=(0,))
