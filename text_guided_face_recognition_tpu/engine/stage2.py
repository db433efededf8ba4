"""Stage-2 FCFM fusion training.

Behavioral port of the fusion entry points (reference: src/fusion_bert.py,
src/fusion_lstm.py): load stage-1 checkpoints, fine-tune text encoder (+head),
image head and fusion net against an ArcFace margin on the fused embedding
(s=30, m=0.5 on fusion_final_dim=640: src/fusion_bert.py:105-115) with
focal/CE loss, three optimizer groups and StepLR schedules (en: step 10 gamma
0.8; cls: step 5 gamma 0.6; head: step 5 gamma 0.97 — src/fusion_bert.py:75-85).

Same SPMD structure as stage 1 (jit over the data mesh, params replicated).
The reference's detached-text quirk applies here too (words/sent are computed
under no_grad then requires_grad_()-ed, src/fusion_bert.py:207-212, which does
NOT backprop into the encoder); default trains the text path,
`compat_frozen_text=True` reproduces the reference.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from text_guided_face_recognition_tpu import ops
from text_guided_face_recognition_tpu.engine import optim
from text_guided_face_recognition_tpu.engine import prepare as prep
from text_guided_face_recognition_tpu.engine.checkpoint import save_checkpoint
from text_guided_face_recognition_tpu.engine.evaluate import run_test
from text_guided_face_recognition_tpu.engine.feature_cache import (
    FrozenFeatureCache,
)
from text_guided_face_recognition_tpu.engine.stage1 import TrainState
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

__all__ = ["FusionTrainer"]


class FusionTrainer:
    def __init__(self, args, logger: Optional[MetricLogger] = None):
        self.args = args
        self.logger = logger or MetricLogger(echo=True)
        self.is_bert = args.en_type == "BERT"

        self.train_dl, self.train_ds = prep.prepare_dataloader(args, "train")
        self.train_ds.check_classifier_coverage(args.num_classes)
        self.valid_dl, self.valid_ds = prep.prepare_dataloader(args, "valid")

        # stage-1 artifacts (reference: Fusion.__init__ :42-68)
        self.backbone = prep.prepare_backbone(args)
        self.text_encoder, self.text_head = prep.prepare_text_encoder(args)
        self.image_head = prep.prepare_image_head(args)
        self.fusion_net = prep.prepare_fusion_net(args, load=False)
        if self.fusion_net is None:
            raise ValueError("stage-2 training requires fusion_type linear|fcfm")

        k = jax.random.PRNGKey(args.manual_seed)
        xavier = jax.nn.initializers.xavier_uniform()
        params: Dict[str, Any] = {
            "text_encoder": self.text_encoder.variables["params"],
            "image_head": self.image_head.variables["params"],
            "fusion_net": self.fusion_net.variables["params"],
            "metric_fc": {"weight": xavier(
                k, (args.num_classes, args.fusion_final_dim))},
        }
        if self.is_bert:
            params["text_head"] = self.text_head.variables["params"]
        batch_stats = {
            "image_head": self.image_head.variables.get("batch_stats", {}),
            "fusion_net": self.fusion_net.variables.get("batch_stats", {}),
        }
        self.tx = optim.make_stage2_tx(args)
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=self.tx.init(params),
                                step=jnp.zeros((), jnp.int32))
        self.lr = {"cls": float(args.lr_image_train), "encoder": 1e-5,
                   "head": float(args.lr_head)}
        self._apply_lrs()
        self.mesh = make_data_mesh(args.num_devices, args.batch_size)
        self._train_step = self._build_train_step()
        self._feat_cache = (FrozenFeatureCache(self.backbone, args)
                            if getattr(args, "frozen_feature_cache", False)
                            else None)
        self.start_epoch = 1
        # rbg dropout PRNG by default — see stage1.py note / docs/BENCHMARKS.md
        self._dropout_key = jax.random.key(
            args.manual_seed + 2, impl=getattr(args, "prng_impl", "rbg"))

    def _apply_lrs(self):
        opt = self.state.opt_state
        for group, lr in self.lr.items():
            opt = optim.set_lr(opt, group, lr)
        self.state = self.state.replace(opt_state=opt)

    def _build_train_step(self):
        loss_fn = self.build_loss_fn()

        def train_step(state: TrainState, batch, frozen_vars, rng,
                       metric_acc=None):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (new_stats, metrics)), grads = grad_fn(
                state.params, state.batch_stats, batch, frozen_vars, rng)
            grads = optim.cast_grads(
                grads, getattr(self.args, "grads_dtype", "float32"))
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            if metric_acc is not None:
                metrics = jax.tree_util.tree_map(jnp.add, metric_acc, metrics)
            return TrainState(params=new_params, batch_stats=new_stats,
                              opt_state=new_opt, step=state.step + 1), metrics

        # unjitted step kept for scan-chained benchmarking (utils/benching.py)
        self._train_step_fn = train_step
        return jax.jit(train_step, donate_argnums=(0,),
                       compiler_options=resolve_xla_opts(
                           getattr(self.args, "xla_opts_stage2", "none")))

    def build_embed_fn(self):
        """Fused-embedding forward — everything up to the margin head — as a
        pure function (params, batch_stats, batch, frozen_vars, rng) ->
        (output, new_batch_stats). Shared by build_loss_fn and the
        class-sharded partial-FC SPMD step (parallel/partial_fc.py) so both
        paths run the identical forward (reference: get_fusion_output,
        src/fusion_bert.py:144-155)."""
        args = self.args

        def embed_fn(params, batch_stats, batch, frozen_vars, rng):
            # text path
            if self.is_bert:
                words_raw, _ = self.text_encoder.module.apply(
                    {"params": params["text_encoder"]},
                    batch["caps"], batch["mask"], deterministic=False,
                    rngs={"dropout": rng})
                words_emb, sent_emb = self.text_head.module.apply(
                    {"params": params["text_head"]}, words_raw)
            else:
                words_emb, sent_emb = self.text_encoder.module.apply(
                    {"params": params["text_encoder"]},
                    batch["caps"], batch["cap_len"], deterministic=False,
                    rngs={"dropout": rng})
            if args.compat_frozen_text:
                words_emb = jax.lax.stop_gradient(words_emb)
                sent_emb = jax.lax.stop_gradient(sent_emb)

            # frozen backbone (precomputed when frozen_feature_cache is on)
            if "img_gl" in batch:
                gl, lc = batch["img_gl"], batch["img_lc"]
            else:
                img = ops.device_normalize(batch["img"], args.model_type)
                out = self.backbone.module.apply(frozen_vars, img,
                                                 train=False)
                gl, lc = (out[0], out[1])
                gl = jax.lax.stop_gradient(gl)
                lc = jax.lax.stop_gradient(lc)

            (img_f, local_f), ih_updates = self.image_head.module.apply(
                {"params": params["image_head"],
                 "batch_stats": batch_stats["image_head"]},
                gl, lc, train=True, mutable=["batch_stats"])

            # fusion dispatch (reference: get_fusion_output :144-155)
            fn_vars = {"params": params["fusion_net"]}
            if batch_stats["fusion_net"]:
                fn_vars["batch_stats"] = batch_stats["fusion_net"]
            if args.fusion_type == "linear":
                output = self.fusion_net.module.apply(fn_vars, img_f, sent_emb)
                fn_updates = {"batch_stats": batch_stats["fusion_net"]}
            elif args.fusion_type == "fcfm" and args.en_type == "LSTM":
                output = self.fusion_net.module.apply(fn_vars, local_f,
                                                      words_emb)
                fn_updates = {"batch_stats": batch_stats["fusion_net"]}
            else:  # fcfm BERT
                output, fn_updates = self.fusion_net.module.apply(
                    fn_vars, local_f, words_emb, img_f, sent_emb, train=True,
                    mutable=["batch_stats"])

            new_stats = {"image_head": ih_updates["batch_stats"],
                         "fusion_net": fn_updates.get(
                             "batch_stats", batch_stats["fusion_net"])}
            return output, new_stats

        return embed_fn

    def build_loss_fn(self):
        """Stage-2 margin loss as a pure function (per-sample — no cross-batch
        matrices, so SPMD needs only grad-pmean; parallel/spmd.py)."""
        args = self.args
        use_focal = args.model_type == "arcface" and args.loss == "focal_loss"
        embed_fn = self.build_embed_fn()

        def loss_fn(params, batch_stats, batch, frozen_vars, rng):
            label = batch["cls_id"].astype(jnp.int32)
            output, new_stats = embed_fn(params, batch_stats, batch,
                                         frozen_vars, rng)
            logits = ops.arc_margin_logits(
                output, params["metric_fc"]["weight"], label, s=30.0, m=0.5,
                easy_margin=args.easy_margin)
            if use_focal:
                loss = ops.focal_loss(logits, label, gamma=2.0)
            else:
                loss = ops.cross_entropy_rows(logits, label)
            return loss, (new_stats, {"loss": loss})

        return loss_fn

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
        total = float(acc["loss"]) if acc is not None else 0.0
        nan_guard({"loss": total}, step=n)
        dt = time.time() - t0
        out = {"epoch": epoch, "loss": total / max(n * args.batch_size, 1),
               "steps": n,
               "pairs_per_sec": n * args.batch_size / dt if dt > 0 else 0.0}
        self.logger.log(out)
        return out

    def schedule_epoch_end(self, epoch: int):
        """StepLR triplet (reference: src/fusion_bert.py:75-85)."""
        if epoch % 10 == 0:
            self.lr["encoder"] *= 0.8
        if epoch % 5 == 0:
            self.lr["cls"] *= 0.6
            self.lr["head"] *= 0.97
        self._apply_lrs()

    def _bundles_from_state(self):
        """Current-weights Bundles for the shared eval loop."""
        import dataclasses as dc
        te = dc.replace(self.text_encoder, variables={
            "params": self.state.params["text_encoder"]})
        th = None
        if self.is_bert:
            th = dc.replace(self.text_head, variables={
                "params": self.state.params["text_head"]})
        ih = dc.replace(self.image_head, variables={
            "params": self.state.params["image_head"],
            "batch_stats": self.state.batch_stats["image_head"]})
        fn_vars = {"params": self.state.params["fusion_net"]}
        if self.state.batch_stats["fusion_net"]:
            fn_vars["batch_stats"] = self.state.batch_stats["fusion_net"]
        fn = dc.replace(self.fusion_net, variables=fn_vars)
        return te, th, ih, fn

    def save_models(self, save_dir: str, epoch: int):
        """Two-artifact layout (reference: src/fusion_bert.py:166-191)."""
        args = self.args
        fn_tree = {"params": self.state.params["fusion_net"]}
        if self.state.batch_stats["fusion_net"]:
            fn_tree["batch_stats"] = self.state.batch_stats["fusion_net"]
        save_checkpoint(
            f"{save_dir}/fusion_{args.fusion_type}_{args.model_type}_{epoch}",
            {"net": fn_tree,
             "image_head": {"params": self.state.params["image_head"],
                            "batch_stats": self.state.batch_stats["image_head"]}})
        text_tree = {"model": {"params": self.state.params["text_encoder"]}}
        if self.is_bert:
            text_tree["head"] = {"params": self.state.params["text_head"]}
        save_checkpoint(
            f"{save_dir}/encoder_{args.en_type}_{args.fusion_type}_{epoch}",
            text_tree)

    def save_state(self, save_dir: str, epoch: int):
        """Full resumable state (the reference's resume loads a checkpoint
        layout its save never writes: src/fusion_bert.py:158-163 vs
        utils/utils.py:75-81; here resume is a first-class artifact)."""
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
            path, like, self.args, optim.make_stage2_tx,
            self.state.params, optim._stage2_group)
        self.state = TrainState(params=tree["params"],
                                batch_stats=tree["batch_stats"],
                                opt_state=tree["opt_state"],
                                step=self.state.step)
        self.lr = {k: float(v) for k, v in tree["meta"]["lr"].items()}
        self._apply_lrs()
        self.start_epoch = int(tree["meta"]["epoch"]) + 1
        print("resumed from", path, "at epoch", self.start_epoch)

    def main(self):
        """Epoch loop (reference: src/fusion_bert.py:251-274)."""
        args = self.args
        save_dir = os.path.join(
            args.checkpoints_path, args.dataset_name, args.CONFIG_NAME,
            f"{args.en_type}_{args.model_type}", args.fusion_type)
        if args.resume_model_path and args.resume_epoch > 1:
            self.resume_from(args.resume_model_path)
        print("Start Training")
        for epoch in range(self.start_epoch, args.max_epoch + 1):
            args.current_epoch = epoch
            self.train_epoch(epoch)
            self.schedule_epoch_end(epoch)
            if epoch % args.save_interval == 0:
                self.save_models(save_dir, epoch)
                self.save_state(save_dir, epoch)
                from text_guided_face_recognition_tpu.engine.checkpoint \
                    import prune_checkpoints
                prune_checkpoints(save_dir, args.keep_last_ckpts)
            if epoch > 20 and args.do_test and \
                    epoch % args.test_interval == 0:
                print("\nLet's test the model")
                te, th, ih, fn = self._bundles_from_state()
                run_test(args, self.valid_dl, self.backbone, ih, fn, te, th)
