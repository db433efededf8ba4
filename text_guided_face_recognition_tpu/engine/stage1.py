"""Stage-1 FCAM pretraining (encoder alignment).

Behavioral port of the two stage-1 entry points (reference:
src/train_encoders_bert.py, src/train_encoders_lstm.py) as ONE jit-compiled
SPMD train step per configuration:

  * frozen COTS backbone (eval-mode BN) -> ImageHeading (global 256 + IMIM
    local 14x14x256)
  * BERT or LSTM text path -> (words 256xT, sent 256)
  * loss cocktail gated by the same flags (is_DAMSM / is_CLIP / is_CMP /
    is_ident_loss) with the reference's weights; DAMSM runs the vectorized
    ops.words_loss (no per-caption loop)
  * one optax.multi_transform with the reference's three optimizer groups;
    epoch-edge LR schedule reproduced host-side (engine/optim.py)

Parallelism: the step is jitted over a 1-D data mesh — batch sharded,
params replicated; XLA all-gathers embeddings for the B x B contrastive
matrices over ICI (reference equivalence: DataParallel's gathered-loss,
SURVEY.md §2.12).

Reference quirks handled explicitly (see docs/DEVIATIONS.md):
  * the reference computes text features under torch.no_grad() + .detach()
    in BOTH stages (utils/dataset_utils.py:38-46), so its text encoder/head
    optimizers never receive gradients. Default here trains them (the
    documented intent); `compat_frozen_text=True` reproduces the reference.
  * the reference calls clip_grad_norm_ AFTER optimizer.step()
    (src/train_encoders_bert.py:323-331) — a no-op. Default matches that
    behavior (no clip; the whole-tree norm pass costs ~1.25 ms/step);
    `apply_grad_clip=True` applies the comment's intent (pre-step
    text-encoder clip by clip_max_norm). DEVIATIONS #3.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from text_guided_face_recognition_tpu import ops
from text_guided_face_recognition_tpu.engine import optim
from text_guided_face_recognition_tpu.engine import prepare as prep
from text_guided_face_recognition_tpu.engine.checkpoint import save_checkpoint
from text_guided_face_recognition_tpu.engine.evaluate import validate_concat
from text_guided_face_recognition_tpu.engine.feature_cache import (
    FrozenFeatureCache,
)
from text_guided_face_recognition_tpu.parallel import (
    make_data_mesh,
    prefetch_to_device,
)
from text_guided_face_recognition_tpu.utils.logging import MetricLogger
from text_guided_face_recognition_tpu.utils.xla_opts import resolve_xla_opts
from text_guided_face_recognition_tpu.utils.profiling import (
    maybe_profile,
    nan_guard,
)

__all__ = ["TrainState", "Stage1Trainer"]


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class Stage1Trainer:
    """Stage-1 trainer for en_type in {BERT, LSTM, GRU}."""

    def __init__(self, args, logger: Optional[MetricLogger] = None):
        self.args = args
        self.logger = logger or MetricLogger(echo=True)
        self.is_bert = args.en_type == "BERT"

        # data (must run first: LSTM fills args.vocab_size from the corpus,
        # reference src/train_encoders_lstm.py:51)
        self.train_dl, self.train_ds = prep.prepare_dataloader(args, "train")
        self.train_ds.check_classifier_coverage(args.num_classes)
        self.valid_dl, self.valid_ds = prep.prepare_dataloader(args, "valid")
        args.len_train_dl = len(self.train_dl)

        # models
        self.backbone = prep.prepare_backbone(args)
        self.image_head = prep.prepare_image_head(args, load=False)
        self.text_encoder, self.text_head = prep.prepare_text_encoder(
            args, load=False)

        feat = args.aux_feat_dim_per_granularity
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(args.manual_seed), 3)
        xavier = jax.nn.initializers.xavier_uniform()
        params: Dict[str, Any] = {
            "image_head": self.image_head.variables["params"],
            "text_encoder": self.text_encoder.variables["params"],
            # reference margins: image s=30, text s=35 (both m=0.5)
            "image_cls": {"weight": xavier(k1, (args.num_classes, feat))},
            "text_cls": {"weight": xavier(k2, (args.num_classes, feat))},
        }
        if self.is_bert:
            params["text_head"] = self.text_head.variables["params"]
        if args.is_CMP:
            params["cmp"] = {"W": jax.random.normal(
                k3, (feat, args.num_classes), jnp.float32)}
        batch_stats = {
            "image_head": self.image_head.variables.get("batch_stats", {})}

        tx_maker = optim.make_stage1_bert_tx if self.is_bert \
            else optim.make_stage1_lstm_tx
        self.tx = tx_maker(args)
        opt_state = self.tx.init(params)
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=opt_state,
                                step=jnp.zeros((), jnp.int32))
        # initial LRs (reference: src/train_encoders_bert.py:212-222 /
        # src/train_encoders_lstm.py:180-189)
        self.lr = {
            "head": float(args.lr_head),
            "encoder": float(args.min_lr_bert if self.is_bert
                             else args.init_lr_lstm),
            "cls": 0.1,
        }
        self._apply_lrs()

        self.mesh = make_data_mesh(args.num_devices, args.batch_size)
        self._train_step = self._build_train_step()
        # per-epoch frozen-backbone precompute (engine/feature_cache.py):
        # the conv tower leaves the train step; exact-semantics A/B in
        # docs/BENCHMARKS.md
        self._feat_cache = (FrozenFeatureCache(self.backbone, args)
                            if getattr(args, "frozen_feature_cache", False)
                            else None)
        self.start_epoch = 1
        # dropout-mask PRNG: rbg (hardware RNG) by default — threefry is
        # ALU-heavy on TPU and cost ~14% of the stage-1 step (A/B in
        # docs/BENCHMARKS.md); mask values carry no parity constraint.
        # Param init stays threefry (bit-stable across backends).
        self._dropout_key = jax.random.key(
            args.manual_seed + 1, impl=getattr(args, "prng_impl", "rbg"))

    # ------------------------------------------------------------- helpers --

    def _apply_lrs(self):
        opt = self.state.opt_state
        for group, lr in self.lr.items():
            opt = optim.set_lr(opt, group, lr)
        self.state = self.state.replace(opt_state=opt)

    def _text_forward(self, params, batch, rng):
        if self.is_bert:
            words_raw, _ = self.text_encoder.module.apply(
                {"params": params["text_encoder"]},
                batch["caps"], batch["mask"], deterministic=False,
                rngs={"dropout": rng})
            words_emb, sent_emb = self.text_head.module.apply(
                {"params": params["text_head"]}, words_raw)
            word_mask = None  # fixed bert_words_num-2 valid words
        else:
            words_emb, sent_emb = self.text_encoder.module.apply(
                {"params": params["text_encoder"]},
                batch["caps"], batch["cap_len"], deterministic=False,
                rngs={"dropout": rng})
            t = words_emb.shape[-1]
            word_mask = (jnp.arange(t)[None, :] <
                         batch["cap_len"][:, None].astype(jnp.int32))
        if self.args.compat_frozen_text:
            words_emb = jax.lax.stop_gradient(words_emb)
            sent_emb = jax.lax.stop_gradient(sent_emb)
        return words_emb, sent_emb, word_mask

    def _image_forward(self, frozen_vars, img):
        img = ops.device_normalize(img, self.args.model_type)
        out = self.backbone.module.apply(frozen_vars, img, train=False)
        if self.args.model_type == "adaface":
            gl, lc, _norm = out
        else:
            gl, lc = out
        return jax.lax.stop_gradient(gl), jax.lax.stop_gradient(lc)

    # ---------------------------------------------------------- train step --

    def _build_train_step(self):
        loss_fn = self.build_loss_fn()
        args = self.args

        def train_step(state: TrainState, batch, frozen_vars, rng,
                       metric_acc=None):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (new_img_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch, frozen_vars, rng)
            grads = optim.cast_grads(grads,
                                     getattr(args, "grads_dtype", "float32"))
            # optional text-encoder grad clip (apply_grad_clip; reference
            # behavior is NO clip - DEVIATIONS #3) lives in the encoder
            # group's optimizer chain (optim._clip_global_norm,
            # fp32-accumulated norm) so it fuses with the flat update
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_stats = dict(state.batch_stats)
            new_stats["image_head"] = new_img_stats
            if metric_acc is not None:
                # device-side running sums: the epoch loop never syncs on
                # per-step metrics (each host read is an RPC round trip)
                metrics = jax.tree_util.tree_map(jnp.add, metric_acc, metrics)
            return TrainState(params=new_params, batch_stats=new_stats,
                              opt_state=new_opt, step=state.step + 1), metrics

        # unjitted step kept for scan-chained benchmarking (utils/benching.py)
        self._train_step_fn = train_step
        return jax.jit(train_step, donate_argnums=(0,),
                       compiler_options=resolve_xla_opts(
                           getattr(self.args, "xla_opts", "none")))

    def build_loss_fn(self, axis_name: Optional[str] = None):
        """The stage-1 loss cocktail as a pure function.

        axis_name=None: single logical batch (the default jit+sharding path —
        XLA inserts collectives from the sharded B x B contractions).
        axis_name="data": explicit-SPMD mode for shard_map — embeddings and
        labels are all-gathered over the mesh axis before every contrastive
        matrix, preserving the reference's batch-global-negatives semantics
        (SURVEY.md §2.12) with hand-placed collectives (parallel/spmd.py).
        """
        args = self.args
        g = args.TRAIN.SMOOTH

        def loss_fn(params, batch_stats, batch, frozen_vars, rng):
            class_ids = batch["cls_id"].astype(jnp.int32)

            words_emb, sent_emb, word_mask = self._text_forward(
                params, batch, rng)
            if "img_gl" in batch:  # frozen_feature_cache: precomputed tower
                gl, lc = batch["img_gl"], batch["img_lc"]
            else:
                gl, lc = self._image_forward(frozen_vars, batch["img"])
            (img_f, words_f), updates = self.image_head.module.apply(
                {"params": params["image_head"],
                 "batch_stats": batch_stats["image_head"]},
                gl, lc, train=True, mutable=["batch_stats"])

            if axis_name is not None:
                from text_guided_face_recognition_tpu.parallel import (
                    gather_global_negatives as gather)
                words_emb = gather(words_emb, axis_name)
                sent_emb = gather(sent_emb, axis_name)
                img_f = gather(img_f, axis_name)
                words_f = gather(words_f, axis_name)
                class_ids = gather(class_ids, axis_name)
                if word_mask is not None:
                    word_mask = gather(word_mask, axis_name)
            b = img_f.shape[0]
            labels = jnp.arange(b)

            total = jnp.zeros((), jnp.float32)
            metrics: Dict[str, jnp.ndarray] = {}

            if args.is_DAMSM:
                # local map to (B, D, H, W) for the loss API
                words_f_chw = jnp.transpose(words_f, (0, 3, 1, 2))
                use_pallas = bool(args.use_pallas) and \
                    jax.default_backend() not in ("cpu",)
                w0, w1 = ops.words_loss(words_f_chw, words_emb, labels,
                                        g.GAMMA1, g.GAMMA2, g.GAMMA3,
                                        word_mask=word_mask,
                                        use_pallas=use_pallas)
                s0, s1 = ops.sent_loss(img_f, sent_emb, labels, class_ids,
                                       gamma3=g.GAMMA3)
                if self.is_bert:
                    damsm = w0 + w1 + s0 + s1  # ref bert :272-283
                else:
                    damsm = w0 + w1            # ref lstm :259-270 (sent terms off)
                total += damsm
                metrics["w_loss"] = w0 + w1
                metrics["s_loss"] = s0 + s1
                metrics["damsm_loss"] = damsm

            if args.is_WRA:
                # The reference's is_WRA branch is a `pass`
                # (src/train_encoders_bert.py:286-287) over a partially-ported
                # module; here the flag is live: attention-weighted word
                # InfoNCE with per-word saliency = max region attention from
                # the caption's own image (see ops/wra.py docstring).
                from text_guided_face_recognition_tpu.ops.wra import (
                    word_region_alignment_loss)
                from text_guided_face_recognition_tpu.ops.attention import (
                    func_attention)
                words_q = jnp.swapaxes(words_emb, 1, 2)       # (B, T, D)
                regions_q = words_f.reshape(words_f.shape[0], -1,
                                            words_f.shape[-1])  # (B, R, D)
                _, attn = func_attention(
                    words_emb, jnp.transpose(words_f, (0, 3, 1, 2)),
                    g.GAMMA1, query_mask=word_mask)
                saliency = jnp.max(
                    attn.reshape(attn.shape[0], attn.shape[1], -1), axis=-1)
                wra = word_region_alignment_loss(words_q, regions_q,
                                                 saliency, word_mask)
                total += wra
                metrics["wra_loss"] = wra

            if args.is_ident_loss:
                t_logits = ops.arc_margin_logits(
                    sent_emb, params["text_cls"]["weight"], class_ids,
                    s=35.0, m=0.5)
                tid = ops.focal_loss(t_logits, class_ids, gamma=2.0)
                i_logits = ops.arc_margin_logits(
                    img_f, params["image_cls"]["weight"], class_ids,
                    s=30.0, m=0.5)
                iid = ops.focal_loss(i_logits, class_ids, gamma=2.0)
                total += args.lambda_id * (tid + iid)
                metrics["idn_loss"] = args.lambda_id * (tid + iid)

            if args.is_CLIP:
                if self.is_bert:  # global_loss (ref bert :309-312)
                    cl = ops.global_loss(img_f, sent_emb)
                else:             # ClipLoss (ref lstm :288-291)
                    cl = ops.clip_loss(sent_emb, img_f)
                total += args.lambda_clip * cl
                metrics["clip_loss"] = args.lambda_clip * cl

            if args.is_CMP:
                cmp = ops.cmpc_loss(sent_emb, img_f, class_ids,
                                    params["cmp"]["W"])
                total += cmp
                metrics["cmp_loss"] = cmp

            metrics["total_loss"] = total
            return total, (updates["batch_stats"], metrics)

        return loss_fn

    # -------------------------------------------------------------- epochs --

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        args = self.args
        n = 0
        t0 = time.time()  # refresh stays inside the timed window (honesty)
        frozen = self.backbone.variables
        if self._feat_cache is not None:
            self._feat_cache.refresh(self.train_ds, frozen)
        acc = None
        for device_batch in prefetch_to_device(self.train_dl, self.mesh,
                                               drop_keys=("key",)):
            self._dropout_key, sub = jax.random.split(self._dropout_key)
            with maybe_profile(args, n):
                self.state, acc = self._train_step(
                    self.state, device_batch, frozen, sub, acc)
            n += 1
            if args.max_steps and n >= args.max_steps:
                break
        agg = {k: float(v) for k, v in (acc or {}).items()}  # one sync/epoch
        nan_guard(agg, step=n)
        dt = time.time() - t0
        total_len = n * args.batch_size
        out = {k: v / total_len for k, v in agg.items()}
        out.update(epoch=epoch, steps=n,
                   pairs_per_sec=total_len / dt if dt > 0 else 0.0)
        self.logger.log(out)
        return out

    def schedule_epoch_end(self, epoch: int):
        """reference LR edits: head ExponentialLR(0.98) per epoch
        (src/train_encoders_bert.py:225-226, :406), cls /10 at epochs {3,8}
        (:398-411); the LSTM trainer also decays the encoder Adam (:191-195)."""
        self.lr["head"] *= 0.98
        if not self.is_bert:
            self.lr["encoder"] *= 0.98
        if epoch in (3, 8):
            self.lr["cls"] *= 0.1
            print("Learning Rate change to: {:0.5f}".format(self.lr["cls"]))
        self._apply_lrs()

    def validate(self):
        """Concat-fusion cosine verification on the valid split
        (reference: Train.test, src/train_encoders_bert.py:348-395)."""
        return validate_concat(
            self.args, self.valid_dl, self.backbone,
            self.image_head.module, self.state.params["image_head"],
            self.state.batch_stats["image_head"],
            self.text_encoder.module, self.state.params["text_encoder"],
            self.text_head.module if self.is_bert else None,
            self.state.params.get("text_head"))

    def save_encoders(self, save_dir: str, epoch: int):
        """Two-artifact layout (reference: src/train_encoders_bert.py:59-80)."""
        args = self.args
        image_tree = {"image_head": {
            "params": self.state.params["image_head"],
            "batch_stats": self.state.batch_stats["image_head"]}}
        save_checkpoint(
            f"{save_dir}/{args.model_type}_image_encoder_{epoch}", image_tree)
        text_tree = {"model": {"params": self.state.params["text_encoder"]}}
        if self.is_bert:
            text_tree["head"] = {"params": self.state.params["text_head"]}
        name = args.bert_type if self.is_bert else args.en_type
        save_checkpoint(f"{save_dir}/{name}_text_encoder_{epoch}", text_tree)

    def save_state(self, save_dir: str, epoch: int):
        """Full resumable state (params + stats + optimizer + epoch + LRs) —
        the reference's resume path loads optimizer keys its save never wrote
        (src/train_encoders_bert.py:84-99 vs :59-80); here resume is a
        first-class third artifact."""
        save_checkpoint(f"{save_dir}/train_state_{epoch}", {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "meta": {"epoch": jnp.asarray(epoch),
                     "lr": {k: jnp.asarray(v) for k, v in self.lr.items()}},
        })

    def resume_from(self, path: str):
        from text_guided_face_recognition_tpu.engine.checkpoint import (
            load_train_state)
        like = {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "meta": {"epoch": jnp.asarray(0),
                         "lr": {k: jnp.asarray(v) for k, v in self.lr.items()}}}
        tree = load_train_state(
            path, like, self.args,
            (optim.make_stage1_bert_tx if self.is_bert
             else optim.make_stage1_lstm_tx),
            self.state.params, optim._stage1_group)
        self.state = TrainState(params=tree["params"],
                                batch_stats=tree["batch_stats"],
                                opt_state=tree["opt_state"],
                                step=self.state.step)
        self.lr = {k: float(v) for k, v in tree["meta"]["lr"].items()}
        self._apply_lrs()
        self.start_epoch = int(tree["meta"]["epoch"]) + 1
        print("resumed from", path, "at epoch", self.start_epoch)

    def main(self):
        """Epoch loop (reference: src/train_encoders_bert.py:398-421)."""
        import os
        args = self.args
        if args.resume_model_path and args.resume_epoch > 1:
            self.resume_from(args.resume_model_path)
        save_dir = os.path.join(
            args.checkpoints_path, args.dataset_name, args.CONFIG_NAME,
            f"{args.en_type}_{args.model_type}",
            args.bert_type if self.is_bert else "")
        for epoch in range(self.start_epoch, args.max_epoch + 1):
            args.current_epoch = epoch
            self.train_epoch(epoch)
            self.schedule_epoch_end(epoch)
            if epoch % args.save_interval == 0 or epoch == args.max_epoch:
                print("saving image and text encoder\n")
                self.save_encoders(save_dir, epoch)
                self.save_state(save_dir, epoch)
                from text_guided_face_recognition_tpu.engine.checkpoint \
                    import prune_checkpoints
                prune_checkpoints(save_dir, args.keep_last_ckpts)
            if epoch > 12 and epoch % args.test_interval == 0:
                print("start validating")
                self.validate()
