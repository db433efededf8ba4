"""Weight-converter activation parity (SURVEY.md §7 hard part 1).

Independent torch implementations of the backbone architectures (written here
from the architecture spec, NOT copied from the reference) are random-
initialized, their state_dicts converted by engine/convert.py, and the flax
models' activations compared end-to-end in eval mode. This is the harness that
decides whether pretrained .pth checkpoints reproduce reference verification
scores.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu import models as M
from text_guided_face_recognition_tpu.engine import convert as C

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------- torch iresnet18 ----

class TorchIBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(inplanes, eps=1e-5)
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.prelu = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(self.bn1(x))))))
        return out + identity


class TorchIResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.prelu = tnn.PReLU(64)
        self.inplanes = 64
        for i, planes in enumerate((64, 128, 256, 512), start=1):
            setattr(self, f"layer{i}", self._make_layer(planes, 2))
        self.bn2 = tnn.BatchNorm2d(512, eps=1e-5)
        self.fc = tnn.Linear(512 * 49, 512)
        self.features = tnn.BatchNorm1d(512, eps=1e-5)

    def _make_layer(self, planes, blocks):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes, 1, 2, bias=False),
            tnn.BatchNorm2d(planes, eps=1e-5))
        layers = [TorchIBasicBlock(self.inplanes, planes, 2, downsample)]
        self.inplanes = planes
        layers += [TorchIBasicBlock(planes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        local = x
        x = self.layer4(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        x = self.fc(x)
        return self.features(x), local


def _randomize_bn_stats(model, rng):
    """Give BN layers nontrivial running stats so eval-mode parity is real."""
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.running_mean.data = torch.tensor(
                rng.normal(0, 0.5, m.running_mean.shape).astype(np.float32))
            m.running_var.data = torch.tensor(
                rng.uniform(0.5, 2.0, m.running_var.shape).astype(np.float32))
            if m.weight is not None:
                m.weight.data = torch.tensor(
                    rng.uniform(0.5, 1.5, m.weight.shape).astype(np.float32))
                m.bias.data = torch.tensor(
                    rng.normal(0, 0.2, m.bias.shape).astype(np.float32))


def test_iresnet18_converted_weights_match_torch():
    rng = np.random.default_rng(0)
    tmodel = TorchIResNet18().eval()
    _randomize_bn_stats(tmodel, rng)
    # the reference freezes features.weight at 1 (models/iresnet.py:107-109)
    tmodel.features.weight.data.fill_(1.0)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    tree = C.convert_iresnet(sd, layers=(2, 2, 2, 2))

    net = M.iresnet18()
    x = rng.normal(size=(2, 112, 112, 3)).astype(np.float32) * 0.5
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    emb, local = net.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        temb, tlocal = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(np.asarray(emb), temb.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(local),
                               tlocal.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=2e-3)


def test_iresnet_features_bn_scale_folding():
    # non-unit features.weight must be folded into running_var
    rng = np.random.default_rng(1)
    tmodel = TorchIResNet18().eval()
    _randomize_bn_stats(tmodel, rng)  # leaves features.weight != 1

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    tree = C.convert_iresnet(sd)
    net = M.iresnet18()
    x = rng.normal(size=(2, 112, 112, 3)).astype(np.float32) * 0.5
    emb, _ = net.apply({"params": tree["params"],
                        "batch_stats": tree["batch_stats"]},
                       jnp.asarray(x), train=False)
    with torch.no_grad():
        temb, _ = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(emb), temb.numpy(),
                               rtol=1e-3, atol=2e-3)


# ----------------------------------------------------------- torch ir_18 ----

class TorchBasicBlockIR(tnn.Module):
    def __init__(self, in_c, depth, stride):
        super().__init__()
        if in_c == depth:
            self.shortcut_layer = tnn.MaxPool2d(1, stride)
        else:
            self.shortcut_layer = tnn.Sequential(
                tnn.Conv2d(in_c, depth, 1, stride, bias=False),
                tnn.BatchNorm2d(depth))
        self.res_layer = tnn.Sequential(
            tnn.BatchNorm2d(in_c),
            tnn.Conv2d(in_c, depth, 3, 1, 1, bias=False),
            tnn.BatchNorm2d(depth), tnn.PReLU(depth),
            tnn.Conv2d(depth, depth, 3, stride, 1, bias=False),
            tnn.BatchNorm2d(depth))

    def forward(self, x):
        return self.res_layer(x) + self.shortcut_layer(x)


class TorchIR18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.input_layer = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, 1, 1, bias=False), tnn.BatchNorm2d(64),
            tnn.PReLU(64))
        blocks = []
        in_c = 64
        for depth in (64, 128, 256, 512):
            blocks.append(TorchBasicBlockIR(in_c, depth, 2))
            blocks.append(TorchBasicBlockIR(depth, depth, 1))
            in_c = depth
        self.body = tnn.Sequential(*blocks)
        self.output_layer = tnn.Sequential(
            tnn.BatchNorm2d(512), tnn.Dropout(0.4), tnn.Flatten(),
            tnn.Linear(512 * 49, 512), tnn.BatchNorm1d(512, affine=False))

    def forward(self, x):
        x = self.input_layer(x)
        local = None
        for i, m in enumerate(self.body):
            x = m(x)
            if i == 5:
                local = x
        x = self.output_layer(x)
        norm = torch.norm(x, 2, 1, True)
        return x / norm, local, norm


def test_irbackbone_converted_weights_match_torch():
    rng = np.random.default_rng(2)
    tmodel = TorchIR18().eval()
    _randomize_bn_stats(tmodel, rng)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    tree = C.convert_irbackbone(sd, num_layers=18)
    net = M.build_model("ir_18")
    # init to get param structure for the dropout-free apply, then overwrite
    x = rng.normal(size=(2, 112, 112, 3)).astype(np.float32) * 0.5
    init_vars = net.init(KEY, jnp.zeros((1, 112, 112, 3)))
    params = {**init_vars["params"], **tree["params"]}
    stats = {**init_vars["batch_stats"], **tree["batch_stats"]}
    gl, lc, norm = net.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), train=False, deterministic=True)
    with torch.no_grad():
        tgl, tlc, tnorm = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(gl), tgl.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lc),
                               tlc.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=2e-3)


# --------------------------------------------------------------- HF BERT ----

def test_bert_converter_matches_hf_torch():
    from transformers import BertConfig, BertModel
    from text_guided_face_recognition_tpu.models.text_bert import (
        TextArch, TransformerEncoder)

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=40, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    tmodel = BertModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    tree = C.convert_bert_encoder(sd, num_layers=2)

    arch = TextArch(120, 32, 2, 4, 64, 40)
    enc = TransformerEncoder(arch)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 120, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[1, 8:] = 0
    out = enc.apply({"params": tree["params"]}, jnp.asarray(ids),
                    jnp.asarray(mask))
    with torch.no_grad():
        tout = tmodel(torch.tensor(ids.astype(np.int64)),
                      attention_mask=torch.tensor(mask.astype(np.int64)))
    ref = tout.last_hidden_state.numpy()
    # compare valid positions only (masked positions may legitimately differ)
    np.testing.assert_allclose(np.asarray(out)[0], ref[0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out)[1, :8], ref[1, :8], atol=2e-4)


# ------------------------------------------- legacy qkv checkpoint restore ----

def test_legacy_qkv_checkpoint_migrates_on_restore(tmp_path):
    """Orbax states saved before the r2 QKV fusion hold separate
    query/key/value Dense leaves; load_checkpoint must concatenate them into
    the fused 'qkv' leaf ([q|k|v] along the output axis — the unpack order of
    models/text_bert.py's reshape (B,T,3,heads,d_head))."""
    from text_guided_face_recognition_tpu.engine.checkpoint import (
        load_checkpoint, migrate_legacy_qkv, save_checkpoint)

    rng = np.random.default_rng(0)
    h = 8
    legacy_attn = {
        "query": {"kernel": rng.normal(size=(h, h)).astype(np.float32),
                  "bias": rng.normal(size=(h,)).astype(np.float32)},
        "key": {"kernel": rng.normal(size=(h, h)).astype(np.float32),
                "bias": rng.normal(size=(h,)).astype(np.float32)},
        "value": {"kernel": rng.normal(size=(h, h)).astype(np.float32),
                  "bias": rng.normal(size=(h,)).astype(np.float32)},
        "out": {"kernel": rng.normal(size=(h, h)).astype(np.float32)},
    }
    legacy = {"model": {"params": {"layer_0": {"attn": legacy_attn}}}}
    path = str(tmp_path / "legacy_ckpt")
    save_checkpoint(path, legacy)

    like_attn = {"qkv": {"kernel": jnp.zeros((h, 3 * h)),
                         "bias": jnp.zeros((3 * h,))},
                 "out": {"kernel": jnp.zeros((h, h))}}
    like = {"model": {"params": {"layer_0": {"attn": like_attn}}}}
    out = load_checkpoint(path, like=like)
    got = out["model"]["params"]["layer_0"]["attn"]
    want_k = np.concatenate([legacy_attn["query"]["kernel"],
                             legacy_attn["key"]["kernel"],
                             legacy_attn["value"]["kernel"]], axis=-1)
    want_b = np.concatenate([legacy_attn["query"]["bias"],
                             legacy_attn["key"]["bias"],
                             legacy_attn["value"]["bias"]], axis=-1)
    np.testing.assert_array_equal(np.asarray(got["qkv"]["kernel"]), want_k)
    np.testing.assert_array_equal(np.asarray(got["qkv"]["bias"]), want_b)
    np.testing.assert_array_equal(np.asarray(got["out"]["kernel"]),
                                  legacy_attn["out"]["kernel"])

    # already-fused trees pass through unchanged
    fused = migrate_legacy_qkv({"attn": dict(like_attn)})
    assert set(fused["attn"]) == {"qkv", "out"}

    # partial restore path migrates too
    out2 = load_checkpoint(path, like={"model": like["model"]}, partial=True)
    np.testing.assert_array_equal(
        np.asarray(out2["model"]["params"]["layer_0"]["attn"]["qkv"]["kernel"]),
        want_k)
