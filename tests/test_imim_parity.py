"""IMIM + ImageHeading end-to-end numeric parity against an independent torch
implementation of the reference architecture (models/models.py:328-405) with
weights copied across frameworks, eval mode (running BN stats)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu import models as M

KEY = jax.random.PRNGKey(0)


class TorchIMIM(tnn.Module):
    def __init__(self, c=256, feat=256):
        super().__init__()
        self.c = c
        self.bn_img = tnn.BatchNorm2d(c)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.ln = tnn.LayerNorm([c, 14, 14])
        self.c1 = tnn.Conv2d(c, c // 2, 1)
        self.c2 = tnn.Conv2d(c // 2, c, 1)
        self.proj = tnn.Linear(c, feat)

    def forward(self, img):
        img = self.bn_img(img)
        n, c, h, w = img.shape
        q = self.q(img).reshape(n, c, h * w)
        k = self.k(img).reshape(n, c, -1).transpose(2, 1)
        attn = F.softmax(torch.bmm(k, q) / np.sqrt(self.c / 1.0), dim=-1)
        v = self.v(img).reshape(n, c, -1).transpose(2, 1)
        img = torch.bmm(attn, v).permute(0, 2, 1).reshape(n, c, w, h)
        img = self.ln(img)
        img = F.relu(self.c1(img))
        img = F.relu(self.c2(img))
        img = img.permute(0, 2, 3, 1)
        img = F.normalize(self.proj(img), p=2, dim=-1)
        img = F.normalize(img, p=2, dim=-1)
        return img.permute(0, 3, 1, 2)


class TorchImageHeading(tnn.Module):
    def __init__(self):
        super().__init__()
        self.project_global = tnn.Linear(512, 256)
        self.imim = TorchIMIM()

    def forward(self, gl, lc):
        lc = self.imim(lc)
        gl = F.normalize(self.project_global(gl), p=2, dim=-1)
        return gl, lc


def _conv1x1(dense):
    return (torch.tensor(np.asarray(dense["kernel"]).T[:, :, None, None]),
            torch.tensor(np.asarray(dense["bias"])))


def test_image_heading_matches_torch_oracle():
    rng = np.random.default_rng(0)
    B = 2
    gl = rng.normal(size=(B, 512)).astype(np.float32)
    lc = rng.normal(size=(B, 14, 14, 256)).astype(np.float32)

    head = M.ImageHeading(feat_dim=256)
    variables = head.init(KEY, jnp.asarray(gl), jnp.asarray(lc))
    p = variables["params"]
    stats = variables["batch_stats"]
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape), x.dtype), stats)

    t = TorchImageHeading().eval()
    ip = p["imim"]
    t.imim.bn_img.weight.data = torch.tensor(np.asarray(ip["bn_img"]["scale"]))
    t.imim.bn_img.bias.data = torch.tensor(np.asarray(ip["bn_img"]["bias"]))
    t.imim.bn_img.running_mean.data = torch.tensor(
        np.asarray(stats["imim"]["bn_img"]["mean"]))
    t.imim.bn_img.running_var.data = torch.tensor(
        np.asarray(stats["imim"]["bn_img"]["var"]))
    for tl, fl in ((t.imim.q, "query_proj"), (t.imim.k, "key_proj"),
                   (t.imim.v, "value_proj")):
        tl.weight.data, tl.bias.data = _conv1x1(ip["sa"][fl])
    t.imim.ln.weight.data = torch.tensor(
        np.asarray(ip["ln"]["scale"]).transpose(2, 0, 1))
    t.imim.ln.bias.data = torch.tensor(
        np.asarray(ip["ln"]["bias"]).transpose(2, 0, 1))
    for tl, fl in ((t.imim.c1, "conv1x1_1"), (t.imim.c2, "conv1x1_2")):
        tl.weight.data = torch.tensor(
            np.asarray(ip[fl]["kernel"]).transpose(3, 2, 0, 1))
        tl.bias.data = torch.tensor(np.asarray(ip[fl]["bias"]))
    t.imim.proj.weight.data = torch.tensor(
        np.asarray(ip["project_local"]["projection"]["kernel"]).T)
    t.imim.proj.bias.data = torch.tensor(
        np.asarray(ip["project_local"]["projection"]["bias"]))
    t.project_global.weight.data = torch.tensor(
        np.asarray(p["project_global"]["projection"]["kernel"]).T)
    t.project_global.bias.data = torch.tensor(
        np.asarray(p["project_global"]["projection"]["bias"]))

    (pg, pl), _ = head.apply({"params": p, "batch_stats": stats},
                             jnp.asarray(gl), jnp.asarray(lc), train=False,
                             mutable=["batch_stats"])
    with torch.no_grad():
        tg, tl_ = t(torch.tensor(gl), torch.tensor(lc.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pg), tg.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pl),
                               tl_.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
