"""FCFM ('Working') end-to-end numeric parity against an independent torch
implementation of the reference architecture (models/fusion_nets.py:217-258)
with weights copied across frameworks — covers conv(valid)->relu->maxpool->BN,
the word Gram map, conv-projected self-attention, blockwise LayerNorm, and the
640-d concat head in eval mode."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu import models as M

KEY = jax.random.PRNGKey(0)


class TorchWorking(tnn.Module):
    """Independent torch implementation of the reference FCFM (from spec)."""

    def __init__(self, c=36):
        super().__init__()
        self.c = c
        self.bn_img = tnn.BatchNorm2d(c)
        self.bn_word = tnn.BatchNorm2d(c)
        self.projection = tnn.Linear(256, c)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.conv = tnn.Conv2d(256, c, 3, padding=0)
        self.ln = tnn.LayerNorm([c, 6, 6])
        self.ln_gl = tnn.LayerNorm([256])
        self.ln_sent = tnn.LayerNorm([256])
        self.linear = tnn.Linear(324, 128)

    def sa(self, x, y):
        n, c, h, w = x.shape
        q = self.q(y).reshape(n, c, h * w)
        k = self.k(x).reshape(n, c, -1).transpose(2, 1)
        attn = F.softmax(torch.bmm(k, q) / np.sqrt(self.c / 1.0), dim=-1)
        v = self.v(x).reshape(n, c, -1).transpose(2, 1)
        out = torch.bmm(attn, v).permute(0, 2, 1).reshape(n, c, w, h)
        return out

    def forward(self, img, word, gl_img, sent):
        img = F.max_pool2d(F.relu(self.conv(img)), 2)
        img = self.bn_img(img)
        w = self.projection(word.transpose(1, 2))
        gram = torch.bmm(w.transpose(1, 2), w) / np.sqrt(self.c)
        wmap = gram.unsqueeze(-1).reshape(gram.size(0), self.c, 6, 6)
        wmap = self.bn_word(wmap)
        iw = self.sa(img, wmap)
        iw = self.ln(iw)
        iw = F.max_pool2d(iw, 2)
        iw = self.linear(iw.reshape(iw.size(0), -1))
        return torch.cat([iw, self.ln_gl(gl_img), self.ln_sent(sent)], dim=1)


def _dense_to_conv1x1(p):
    w = torch.tensor(np.asarray(p["kernel"]).T[:, :, None, None])
    b = torch.tensor(np.asarray(p["bias"]))
    return w, b


def test_fcfm_matches_torch_oracle_eval_mode():
    rng = np.random.default_rng(0)
    B, T = 3, 22
    img = rng.normal(size=(B, 14, 14, 256)).astype(np.float32)
    word = rng.normal(size=(B, 256, T)).astype(np.float32)
    gl = rng.normal(size=(B, 256)).astype(np.float32)
    sent = rng.normal(size=(B, 256)).astype(np.float32)

    net = M.FCFM(channel_dim=36)
    variables = net.init(KEY, jnp.asarray(img), jnp.asarray(word),
                         jnp.asarray(gl), jnp.asarray(sent))
    p = variables["params"]
    stats = variables["batch_stats"]
    # nontrivial BN running stats
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), x.dtype), stats)

    t = TorchWorking(36).eval()
    # copy weights flax -> torch
    t.conv.weight.data = torch.tensor(
        np.asarray(p["conv"]["kernel"]).transpose(3, 2, 0, 1))
    t.conv.bias.data = torch.tensor(np.asarray(p["conv"]["bias"]))
    t.projection.weight.data = torch.tensor(
        np.asarray(p["projection"]["kernel"]).T)
    t.projection.bias.data = torch.tensor(np.asarray(p["projection"]["bias"]))
    for tl, fl in ((t.q, "query_proj"), (t.k, "key_proj"), (t.v, "value_proj")):
        w, b = _dense_to_conv1x1(p["sa"][fl])
        tl.weight.data, tl.bias.data = w, b
    t.linear.weight.data = torch.tensor(np.asarray(p["linear"]["kernel"]).T)
    t.linear.bias.data = torch.tensor(np.asarray(p["linear"]["bias"]))
    # LayerNormCHW params are (H, W, C); torch LayerNorm([C, H, W])
    t.ln.weight.data = torch.tensor(
        np.asarray(p["ln"]["scale"]).transpose(2, 0, 1))
    t.ln.bias.data = torch.tensor(
        np.asarray(p["ln"]["bias"]).transpose(2, 0, 1))
    t.ln_gl.weight.data = torch.tensor(np.asarray(p["ln_gl_image"]["scale"]))
    t.ln_gl.bias.data = torch.tensor(np.asarray(p["ln_gl_image"]["bias"]))
    t.ln_sent.weight.data = torch.tensor(np.asarray(p["ln_sent"]["scale"]))
    t.ln_sent.bias.data = torch.tensor(np.asarray(p["ln_sent"]["bias"]))
    # BN: flax {scale,bias}+{mean,var} -> torch weight/bias/running_*
    for tb, name in ((t.bn_img, "bn_img"), (t.bn_word, "bn_word")):
        tb.weight.data = torch.tensor(np.asarray(p[name]["scale"]))
        tb.bias.data = torch.tensor(np.asarray(p[name]["bias"]))
        tb.running_mean.data = torch.tensor(np.asarray(stats[name]["mean"]))
        tb.running_var.data = torch.tensor(np.asarray(stats[name]["var"]))

    out = net.apply({"params": p, "batch_stats": stats}, jnp.asarray(img),
                    jnp.asarray(word), jnp.asarray(gl), jnp.asarray(sent),
                    train=False)
    with torch.no_grad():
        ref = t(torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(word),
                torch.tensor(gl), torch.tensor(sent)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
