"""WRA loss: golden parity against a torch oracle of the reference math
(models/losses.py:381-424) and jit-cleanliness."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu.ops.wra import word_region_alignment_loss


def oracle(word_emb, region_emb, word_attn, temp=0.1):
    bz, word_num, _ = word_emb.shape
    atten_sim = torch.bmm(word_emb, region_emb.permute(0, 2, 1))
    atten_scores = F.softmax(atten_sim / temp, dim=-1)
    wao = F.normalize(torch.bmm(atten_scores, region_emb), dim=-1)

    atten_weights = word_attn.detach().clone()
    rows = []
    for i in range(bz):
        w = atten_weights[i]
        nonzero = w.nonzero().squeeze(-1)
        lo = torch.quantile(w[nonzero], 0.1)
        hi = torch.quantile(w[nonzero], 0.9)
        w = w.clone()
        w[nonzero] = w[nonzero].clip(lo, hi)
        rows.append(w)
    w = torch.stack(rows)
    w = w / w.sum(dim=1, keepdims=True)

    word_sim = torch.bmm(word_emb, wao.permute(0, 2, 1)) / temp
    targets = torch.arange(word_num).repeat(bz)
    s1 = word_sim.reshape(bz * word_num, word_num)
    l1 = torch.sum(F.cross_entropy(s1, targets, reduction="none") *
                   w.reshape(-1)) / bz
    s2 = word_sim.permute(0, 2, 1).reshape(bz * word_num, word_num)
    l2 = torch.sum(F.cross_entropy(s2, targets, reduction="none") *
                   w.reshape(-1)) / bz
    return ((l1 + l2) / 2).item()


def test_wra_matches_torch_oracle():
    rng = np.random.default_rng(0)
    b, nw, nr, d = 4, 6, 9, 16
    we = rng.normal(size=(b, nw, d)).astype(np.float32)
    re = rng.normal(size=(b, nr, d)).astype(np.float32)
    attn = rng.uniform(0.01, 1.0, size=(b, nw)).astype(np.float32)

    ref = oracle(torch.tensor(we), torch.tensor(re), torch.tensor(attn))
    out = word_region_alignment_loss(jnp.asarray(we), jnp.asarray(re),
                                     jnp.asarray(attn))
    assert float(out) == pytest.approx(ref, rel=1e-4)


def test_wra_jit_and_grad():
    rng = np.random.default_rng(1)
    b, nw, nr, d = 3, 5, 7, 8
    we = jnp.asarray(rng.normal(size=(b, nw, d)).astype(np.float32))
    re = jnp.asarray(rng.normal(size=(b, nr, d)).astype(np.float32))
    attn = jnp.asarray(rng.uniform(0.1, 1, size=(b, nw)).astype(np.float32))
    fn = jax.jit(word_region_alignment_loss)
    v = fn(we, re, attn)
    assert np.isfinite(float(v))
    g = jax.grad(lambda w: word_region_alignment_loss(w, re, attn))(we)
    assert np.all(np.isfinite(np.asarray(g)))
