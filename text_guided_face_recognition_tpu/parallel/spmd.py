"""Explicit shard_map SPMD train step.

The default execution path (engine/stage1.py) jits one logical-batch step and
lets XLA derive the collectives from shardings. This module provides the
hand-placed-collectives formulation for users who want explicit control of the
communication schedule:

  * batch sharded over the 1-D "data" mesh axis
  * text/image towers run per-shard
  * embeddings all-gathered over ICI before every B x B contrastive matrix
    (reference equivalence: nn.DataParallel computes losses on the gathered
    full batch on device 0 — SURVEY.md §2.12)
  * every shard evaluates the identical global loss; parameter gradients are
    psum'd (each shard's grad covers its own activations' contributions via
    the all_gather transpose, so the psum is the exact full-batch gradient)
  * BatchNorm statistics from the image head are pmean'd (cross-replica sync)

Validated against the jit path on the 8-device CPU mesh (tests/test_spmd.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from text_guided_face_recognition_tpu.engine import optim
from text_guided_face_recognition_tpu.engine.stage1 import TrainState

__all__ = ["make_shardmap_train_step"]


def make_shardmap_train_step(trainer, mesh: Mesh, axis: str = "data"):
    """Build an explicit-SPMD stage-1 train step for `trainer` over `mesh`.

    Returns step(state, batch, frozen_vars, rng) with the same signature and
    semantics as trainer._train_step; batch arrays must be shardable on their
    leading axis by mesh.size.
    """
    args = trainer.args
    loss_fn = trainer.build_loss_fn(axis_name=axis)
    train_text = not args.compat_frozen_text
    clip_on = bool(getattr(args, "apply_grad_clip", False)) and \
        float(getattr(args, "clip_max_norm", 0.0) or 0.0) > 0.0

    # Gradient reduction rule: the towers run BEFORE the all_gather, so each
    # shard's gradient covers only its local activations' contributions (the
    # gather's transpose reduce-scatters) -> psum reconstructs the full-batch
    # gradient. The margin/CMP weights are applied AFTER the gather, so every
    # shard already holds the full gradient -> pmean (psum would scale by N).
    pre_gather = ("image_head", "text_encoder", "text_head")

    def per_shard(state: TrainState, batch, frozen_vars, rng):
        # de-correlate dropout across shards (a replicated key would sample
        # identical masks on every shard)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_img_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, frozen_vars, rng)
        # cast BEFORE the collectives: with grads_dtype=bfloat16 the
        # psum/pmean move half the ICI bytes (the 8-way sums are fine in
        # bf16; the clip norm below still accumulates in fp32)
        grads = optim.cast_grads(grads,
                                 getattr(args, "grads_dtype", "float32"))
        grads = {
            k: (jax.lax.psum(v, axis) if k in pre_gather
                else jax.lax.pmean(v, axis))
            for k, v in grads.items()
        }
        if train_text and clip_on:
            te = grads["text_encoder"]
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(te)))
            scale = jnp.minimum(1.0, args.clip_max_norm /
                                jnp.maximum(gnorm, 1e-6))
            grads = dict(grads)
            grads["text_encoder"] = jax.tree_util.tree_map(
                lambda x: x * scale.astype(x.dtype), te)
        updates, new_opt = trainer.tx.update(grads, state.opt_state,
                                             state.params)
        new_params = optax.apply_updates(state.params, updates)
        # cross-replica BN stat sync (DataParallel keeps per-replica stats;
        # pmean is the principled choice — docs/DEVIATIONS.md #6)
        new_stats = dict(state.batch_stats)
        new_stats["image_head"] = jax.lax.pmean(new_img_stats, axis)
        metrics = jax.lax.pmean(metrics, axis)
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1), metrics

    state_specs = P()  # replicated
    step = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_specs, P(axis), state_specs, state_specs),
        out_specs=(state_specs, state_specs),
        check_vma=False)
    return jax.jit(step, donate_argnums=(0,))


def make_shardmap_fusion_step(trainer, mesh: Mesh, axis: str = "data"):
    """Explicit-SPMD stage-2 fusion step.

    The margin CE is per-sample, but the reference's focal loss is NOT: its
    (1-p)^gamma factor is computed from the BATCH-MEAN CE (the batch-mean
    quirk, models/losses.py:313-325 — and DataParallel evaluates it once on
    the gathered full batch on device 0: reference src/fusion_bert.py:228-232).
    A per-shard focal over the local mean would scale every shard's gradient
    by a *different* factor. So the collective lives INSIDE the loss: each
    shard computes its local mean CE, pmean's it to the global mean, and
    applies the focal transform to that — then each shard's gradient is
    exactly 1/N of the full-batch gradient and a psum reconstructs it (for
    plain CE this reduces to the usual mean-of-means data parallelism).
    BN stats are pmean'd."""
    import jax.numpy as jnp

    from text_guided_face_recognition_tpu import ops

    args = trainer.args
    embed_fn = trainer.build_embed_fn()
    use_focal = args.model_type == "arcface" and args.loss == "focal_loss"

    def per_shard(state: TrainState, batch, frozen_vars, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params, batch_stats):
            label = batch["cls_id"].astype(jnp.int32)
            output, new_stats = embed_fn(params, batch_stats, batch,
                                         frozen_vars, rng)
            logits = ops.arc_margin_logits(
                output, params["metric_fc"]["weight"], label, s=30.0, m=0.5,
                easy_margin=args.easy_margin)
            ce = jax.lax.pmean(ops.cross_entropy_rows(logits, label), axis)
            if use_focal:
                p = jnp.exp(-ce)
                loss = (1.0 - p) ** 2.0 * ce
            else:
                loss = ce
            return loss, (new_stats, {"loss": loss})

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats)
        grads = optim.cast_grads(grads,
                                 getattr(args, "grads_dtype", "float32"))
        # the pmean inside the loss makes each shard's grad 1/N of the full
        # gradient: psum, not pmean
        grads = jax.lax.psum(grads, axis)
        updates, new_opt = trainer.tx.update(grads, state.opt_state,
                                             state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_stats = jax.lax.pmean(new_stats, axis)
        # the loss metric is already the global value on every shard
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1), metrics

    step = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(step, donate_argnums=(0,))
