"""WordLevelCFA_LSTM end-to-end numeric parity against an independent torch
implementation of the reference architecture (models/fusion_nets.py:260-291)
with weights copied across frameworks — covers the 16x16 zero-canvas padding,
the channel Gram map, the two self-attention passes (including the reference's
discarded-ln1 quirk), blockwise LayerNorm, avg-pool-8 and the 1024->768 head."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu import models as M

KEY = jax.random.PRNGKey(0)


class TorchWordLevelCFA(tnn.Module):
    def __init__(self, c=256, scale=2):
        super().__init__()
        self.c, self.scale = c, scale
        self.q = tnn.Conv2d(c, c // scale, 1)
        self.k = tnn.Conv2d(c, c // scale, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.ln1 = tnn.LayerNorm([c, 16, 16])
        self.ln2 = tnn.LayerNorm([c, 16, 16])
        self.linear = tnn.Linear(1024, 768)

    def sa(self, x, y):
        n, _, h, w = x.shape
        cq = self.c // self.scale
        q = self.q(y).reshape(n, cq, h * w)
        k = self.k(x).reshape(n, cq, -1).transpose(2, 1)
        attn = F.softmax(torch.bmm(k, q) / np.sqrt(self.c / self.scale),
                         dim=-1)
        v = self.v(x).reshape(n, self.c, -1).transpose(2, 1)
        return torch.bmm(attn, v).permute(0, 2, 1).reshape(n, self.c, w, h)

    def forward(self, gl_img, word):
        img = torch.zeros((gl_img.size(0), self.c, 16, 16))
        img[:, :, 1:15, 1:15] = gl_img
        wmap = torch.bmm(word, word.transpose(1, 2)) / np.sqrt(self.c)
        wmap = wmap.unsqueeze(-1).reshape(wmap.size(0), self.c, 16, 16)
        img2 = self.sa(img, img)
        _ = self.ln1(img2)  # reference computes-but-discards ln1 (:283)
        iw = self.sa(img2, wmap)
        iw = self.ln2(iw)
        iw = F.avg_pool2d(iw, 8)
        return self.linear(iw.reshape(iw.size(0), -1))


def test_wordlevel_cfa_matches_torch_oracle():
    rng = np.random.default_rng(0)
    B, T = 2, 18
    local = rng.normal(size=(B, 14, 14, 256)).astype(np.float32)
    word = rng.normal(size=(B, 256, T)).astype(np.float32)

    net = M.WordLevelCFA_LSTM(channel_dim=256, scale=2)
    variables = net.init(KEY, jnp.asarray(local), jnp.asarray(word))
    p = variables["params"]

    t = TorchWordLevelCFA().eval()

    def conv1x1(dense):
        return (torch.tensor(np.asarray(dense["kernel"]).T[:, :, None, None]),
                torch.tensor(np.asarray(dense["bias"])))

    t.q.weight.data, t.q.bias.data = conv1x1(p["sa"]["query_proj"])
    t.k.weight.data, t.k.bias.data = conv1x1(p["sa"]["key_proj"])
    t.v.weight.data, t.v.bias.data = conv1x1(p["sa"]["value_proj"])
    for tl, fl in ((t.ln1, "ln1"), (t.ln2, "ln2")):
        tl.weight.data = torch.tensor(
            np.asarray(p[fl]["scale"]).transpose(2, 0, 1))
        tl.bias.data = torch.tensor(
            np.asarray(p[fl]["bias"]).transpose(2, 0, 1))
    t.linear.weight.data = torch.tensor(np.asarray(p["linear"]["kernel"]).T)
    t.linear.bias.data = torch.tensor(np.asarray(p["linear"]["bias"]))

    out = net.apply(variables, jnp.asarray(local), jnp.asarray(word))
    with torch.no_grad():
        ref = t(torch.tensor(local.transpose(0, 3, 1, 2)),
                torch.tensor(word)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
