"""LR-schedule A/B: our host-side epoch-edge LR plan vs REAL torch schedulers
configured exactly as the reference configures them
(src/train_encoders_bert.py:212-226 + :398-411 manual milestones;
src/fusion_bert.py:75-85 StepLR triplet). torch's scheduler semantics are the
authority; our schedule_epoch_end must reproduce the per-epoch LR sequence."""

import numpy as np
import pytest
import torch

from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer


class _Stub:
    """Minimal stand-in exposing what schedule_epoch_end touches."""

    def __init__(self, lr, is_bert=True):
        self.lr = dict(lr)
        self.is_bert = is_bert

    def _apply_lrs(self):
        pass


def _torch_lrs(opt):
    return [g["lr"] for g in opt.param_groups][0]


def test_stage1_bert_schedule_matches_torch():
    lr_head, min_lr_bert = 0.002, 2e-5
    p = [torch.nn.Parameter(torch.zeros(2))]
    opt_head = torch.optim.Adam([{"params": p, "lr": lr_head}],
                                betas=(0.5, 0.999))
    opt_cls = torch.optim.SGD([{"params": p}], lr=0.1, momentum=0.9,
                              weight_decay=5e-5)
    sched_head = torch.optim.lr_scheduler.ExponentialLR(opt_head, gamma=0.98)

    stub = _Stub({"head": lr_head, "encoder": min_lr_bert, "cls": 0.1})
    lr = 0.1
    for epoch in range(1, 21):  # reference max_epoch 20 (cfg/train_bert.yml)
        # reference main loop order: train -> scheduler.step -> milestone edit
        sched_head.step()
        if epoch in (3, 8):
            for g in opt_cls.param_groups:
                lr = lr * 0.1
                g["lr"] = lr
        Stage1Trainer.schedule_epoch_end(stub, epoch)
        np.testing.assert_allclose(stub.lr["head"], _torch_lrs(opt_head),
                                   rtol=1e-9, err_msg=f"head @epoch {epoch}")
        np.testing.assert_allclose(stub.lr["cls"], _torch_lrs(opt_cls),
                                   rtol=1e-9, err_msg=f"cls @epoch {epoch}")
        assert stub.lr["encoder"] == min_lr_bert  # BERT encoder LR is fixed


def test_stage1_lstm_schedule_decays_encoder():
    stub = _Stub({"head": 0.002, "encoder": 0.002, "cls": 0.1},
                 is_bert=False)
    p = [torch.nn.Parameter(torch.zeros(2))]
    opt = torch.optim.Adam([{"params": p, "lr": 0.002}])
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.98)
    for epoch in range(1, 37):
        sched.step()
        Stage1Trainer.schedule_epoch_end(stub, epoch)
        np.testing.assert_allclose(stub.lr["encoder"], _torch_lrs(opt),
                                   rtol=1e-9)


def test_stage2_steplr_triplet_matches_torch():
    lr_image_train, lr_head = 0.01, 0.002
    p = [torch.nn.Parameter(torch.zeros(2))]
    opt_en = torch.optim.Adam([{"params": p}], lr=1e-5, weight_decay=0.01)
    opt_cls = torch.optim.SGD([{"params": p, "lr": lr_image_train}])
    opt_head = torch.optim.Adam([{"params": p}], lr=lr_head,
                                weight_decay=5e-5)
    s_en = torch.optim.lr_scheduler.StepLR(opt_en, step_size=10, gamma=0.8)
    s_cls = torch.optim.lr_scheduler.StepLR(opt_cls, step_size=5, gamma=0.6)
    s_head = torch.optim.lr_scheduler.StepLR(opt_head, step_size=5,
                                             gamma=0.97)

    stub = _Stub({"encoder": 1e-5, "cls": lr_image_train, "head": lr_head})
    for epoch in range(1, 37):  # reference max_epoch 36 (cfg/fusion_bert.yml)
        s_en.step()
        s_cls.step()
        s_head.step()
        FusionTrainer.schedule_epoch_end(stub, epoch)
        for group, opt in (("encoder", opt_en), ("cls", opt_cls),
                           ("head", opt_head)):
            np.testing.assert_allclose(
                stub.lr[group], _torch_lrs(opt), rtol=1e-9,
                err_msg=f"{group} @epoch {epoch}")
