"""Golden numeric tests for the FCAM loss layer.

Each test implements the reference's semantics independently as a slow
numpy/torch oracle (per-caption Python loop, exactly as described in
SURVEY.md §2.5) and checks the vectorized jnp implementation against it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from text_guided_face_recognition_tpu.ops import losses as L
from text_guided_face_recognition_tpu.ops import margins as MG

G1, G2, G3 = 4.0, 5.0, 10.0


# ---------------------------------------------------------------- oracles ---

def oracle_func_attention(query, context, gamma1):
    """AttnGAN attention oracle: query (B,D,T), context (B,D,H,W)."""
    b, d, t = query.shape
    r = context.shape[2] * context.shape[3]
    ctx = context.reshape(b, d, r)
    attn = torch.bmm(ctx.transpose(1, 2), query)            # (B, R, T)
    attn = F.softmax(attn.reshape(b * r, t), dim=-1).reshape(b, r, t)
    attn = attn.transpose(1, 2).reshape(b * t, r)           # (B*T, R)
    attn = F.softmax(attn * gamma1, dim=-1).reshape(b, t, r)
    weighted = torch.bmm(ctx, attn.transpose(1, 2))          # (B, D, T)
    return weighted, attn


def oracle_words_loss(img_features, words_emb, cap_lens, gamma1, gamma2, gamma3):
    """Per-caption loop oracle of the DAMSM word loss."""
    b = img_features.shape[0]
    sims = []
    for i in range(b):
        wn = cap_lens[i]
        word = words_emb[i, :, :wn].unsqueeze(0).repeat(b, 1, 1)
        wei, _ = oracle_func_attention(word, img_features, gamma1)
        w = word.transpose(1, 2).reshape(b * wn, -1)
        c = wei.transpose(1, 2).reshape(b * wn, -1)
        cos = (w * c).sum(1) / (w.norm(dim=1) * c.norm(dim=1)).clamp(min=1e-8)
        row = cos.reshape(b, wn)
        row = torch.log(torch.exp(row * gamma2).sum(dim=1, keepdim=True))
        sims.append(row)
    sim = torch.cat(sims, 1) * gamma3                        # (B img, B cap)
    labels = torch.arange(b)
    return (F.cross_entropy(sim, labels).item(),
            F.cross_entropy(sim.t(), labels).item())


def oracle_sent_loss(cnn, rnn, class_ids, gamma3):
    b = cnn.shape[0]
    scores = cnn @ rnn.t()
    norm = cnn.norm(dim=1, keepdim=True) @ rnn.norm(dim=1, keepdim=True).t()
    scores = scores / norm.clamp(min=1e-8) * gamma3
    if class_ids is not None:
        mask = torch.tensor(
            (class_ids[:, None] == class_ids[None, :]) & ~np.eye(b, dtype=bool))
        scores = scores.masked_fill(mask, -float("inf"))
    labels = torch.arange(b)
    return (F.cross_entropy(scores, labels).item(),
            F.cross_entropy(scores.t(), labels).item())


# ----------------------------------------------------------------- tests ----

@pytest.mark.parametrize("seed", [0, 1])
def test_words_loss_matches_loop_oracle_lstm(seed):
    rng = np.random.default_rng(seed)
    b, d, t, hw = 6, 16, 9, 7
    img = rng.normal(size=(b, d, hw, hw)).astype(np.float32)
    words = rng.normal(size=(b, d, t)).astype(np.float32)
    cap_lens = rng.integers(3, t + 1, size=b)

    ref0, ref1 = oracle_words_loss(torch.tensor(img), torch.tensor(words),
                                   cap_lens, G1, G2, G3)

    mask = np.arange(t)[None, :] < cap_lens[:, None]
    l0, l1 = L.words_loss(jnp.asarray(img), jnp.asarray(words),
                          jnp.arange(b), G1, G2, G3,
                          word_mask=jnp.asarray(mask))
    assert float(l0) == pytest.approx(ref0, rel=1e-4)
    assert float(l1) == pytest.approx(ref1, rel=1e-4)


def test_words_loss_bert_fixed_length():
    rng = np.random.default_rng(2)
    b, d, t, hw = 4, 8, 22, 14
    img = rng.normal(size=(b, d, hw, hw)).astype(np.float32)
    words = rng.normal(size=(b, d, t)).astype(np.float32)
    # BERT path: fixed words_num for every caption (models/losses.py:83)
    ref0, ref1 = oracle_words_loss(torch.tensor(img), torch.tensor(words),
                                   [t] * b, G1, G2, G3)
    l0, l1 = L.words_loss(jnp.asarray(img), jnp.asarray(words),
                          jnp.arange(b), G1, G2, G3, word_mask=None)
    assert float(l0) == pytest.approx(ref0, rel=1e-4)
    assert float(l1) == pytest.approx(ref1, rel=1e-4)


def test_words_loss_attn_maps_shape():
    rng = np.random.default_rng(3)
    b, d, t, hw = 3, 8, 5, 4
    img = jnp.asarray(rng.normal(size=(b, d, hw, hw)).astype(np.float32))
    words = jnp.asarray(rng.normal(size=(b, d, t)).astype(np.float32))
    l0, l1, attn = L.words_loss(img, words, jnp.arange(b), return_attn=True)
    assert attn.shape == (b, t, hw, hw)
    np.testing.assert_allclose(np.sum(np.asarray(attn), axis=(2, 3)),
                               np.ones((b, t)), rtol=1e-5)


def test_sent_loss_with_class_mask():
    rng = np.random.default_rng(4)
    b, d = 8, 32
    cnn = rng.normal(size=(b, d)).astype(np.float32)
    rnn = rng.normal(size=(b, d)).astype(np.float32)
    class_ids = np.array([0, 0, 1, 2, 2, 2, 3, 4])
    ref0, ref1 = oracle_sent_loss(torch.tensor(cnn), torch.tensor(rnn),
                                  class_ids, G3)
    l0, l1 = L.sent_loss(jnp.asarray(cnn), jnp.asarray(rnn), jnp.arange(b),
                         jnp.asarray(class_ids), gamma3=G3)
    assert float(l0) == pytest.approx(ref0, rel=1e-5)
    assert float(l1) == pytest.approx(ref1, rel=1e-5)


def test_global_loss():
    rng = np.random.default_rng(5)
    b, d = 8, 16
    cnn = rng.normal(size=(b, d)).astype(np.float32)
    rnn = rng.normal(size=(b, d)).astype(np.float32)
    ref0, ref1 = oracle_sent_loss(torch.tensor(cnn), torch.tensor(rnn), None, 10.0)
    out = L.global_loss(jnp.asarray(cnn), jnp.asarray(rnn))
    assert float(out) == pytest.approx(ref0 + ref1, rel=1e-5)


def test_clip_loss_infonce():
    rng = np.random.default_rng(6)
    b, d = 8, 16
    img = rng.normal(size=(b, d)).astype(np.float32)
    txt = rng.normal(size=(b, d)).astype(np.float32)
    ti, tt = torch.tensor(img), torch.tensor(txt)
    labels = torch.arange(b)
    ref = (F.cross_entropy(ti @ tt.t(), labels) +
           F.cross_entropy(tt @ ti.t(), labels)).item() / 2
    out = L.clip_loss(jnp.asarray(txt), jnp.asarray(img))
    assert float(out) == pytest.approx(ref, rel=1e-5)


def test_clip_soft_loss():
    rng = np.random.default_rng(7)
    b, d, temp = 6, 12, 2.0
    te = torch.tensor(rng.normal(size=(b, d)).astype(np.float32))
    ie = torch.tensor(rng.normal(size=(b, d)).astype(np.float32))
    logits = te @ ie.t() / temp
    targets = F.softmax((ie @ ie.t() + te @ te.t()) / 2 * temp, dim=-1)
    tl = (-targets * F.log_softmax(logits, dim=-1)).sum(1)
    il = (-targets.t() * F.log_softmax(logits.t(), dim=-1)).sum(1)
    ref = ((il + tl) / 2).mean().item()
    out = L.clip_soft_loss(jnp.asarray(te.numpy()), jnp.asarray(ie.numpy()), temp)
    assert float(out) == pytest.approx(ref, rel=1e-5)


def test_cmpc_cmpm():
    rng = np.random.default_rng(8)
    b, d, nc = 8, 16, 10
    te = rng.normal(size=(b, d)).astype(np.float32)
    ie = rng.normal(size=(b, d)).astype(np.float32)
    W = rng.normal(size=(d, nc)).astype(np.float32)
    labels = rng.integers(0, nc, size=b)

    # CMPC oracle
    tt, ti, tw = torch.tensor(te), torch.tensor(ie), torch.tensor(W)
    tl = torch.tensor(labels)
    W_norm = tw / tw.norm(dim=0)
    image_norm = ti / ti.norm(dim=1, keepdim=True)
    text_norm = tt / tt.norm(dim=1, keepdim=True)
    ipt = (ti * text_norm).sum(1, keepdim=True) * text_norm
    tpi = (tt * image_norm).sum(1, keepdim=True) * image_norm
    ref_cmpc = (F.cross_entropy(ipt @ W_norm, tl) +
                F.cross_entropy(tpi @ W_norm, tl)).item()
    out = L.cmpc_loss(jnp.asarray(te), jnp.asarray(ie), jnp.asarray(labels),
                      jnp.asarray(W))
    assert float(out) == pytest.approx(ref_cmpc, rel=1e-4)

    # CMPM oracle
    mask = ((tl.reshape(b, 1) - tl.reshape(1, b)) == 0).float()
    mask_norm = mask / mask.norm(dim=1)
    ipt2 = ti @ text_norm.t()
    tpi2 = tt @ image_norm.t()
    i2t = F.softmax(ipt2, dim=1) * (F.log_softmax(ipt2, dim=1) -
                                    torch.log(mask_norm + 1e-8))
    t2i = F.softmax(tpi2, dim=1) * (F.log_softmax(tpi2, dim=1) -
                                    torch.log(mask_norm + 1e-8))
    ref_cmpm = (i2t.sum(1).mean() + t2i.sum(1).mean()).item()
    out = L.cmpm_loss(jnp.asarray(te), jnp.asarray(ie), jnp.asarray(labels))
    assert float(out) == pytest.approx(ref_cmpm, rel=1e-4)


def test_focal_loss_batch_mean_semantics():
    rng = np.random.default_rng(9)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=8)
    logp = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    ref = ((1 - torch.exp(-logp)) ** 2 * logp).item()
    out = L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
    assert float(out) == pytest.approx(ref, rel=1e-5)


def test_kl_loss():
    rng = np.random.default_rng(10)
    mu = rng.normal(size=(4, 8)).astype(np.float32)
    logvar = rng.normal(size=(4, 8)).astype(np.float32)
    tm, tv = torch.tensor(mu), torch.tensor(logvar)
    ref = (-0.5 * torch.mean(1 + tv - tm.pow(2) - tv.exp())).item()
    out = L.kl_loss(jnp.asarray(mu), jnp.asarray(logvar))
    assert float(out) == pytest.approx(ref, rel=1e-5)


# ------------------------------------------------------------ margin heads --

def test_arc_margin_matches_torch():
    rng = np.random.default_rng(11)
    b, d, nc, s, m = 8, 16, 12, 30.0, 0.5
    emb = rng.normal(size=(b, d)).astype(np.float32)
    wt = rng.normal(size=(nc, d)).astype(np.float32)
    label = rng.integers(0, nc, size=b)

    cosine = F.linear(F.normalize(torch.tensor(emb)), F.normalize(torch.tensor(wt)))
    sine = torch.sqrt((1.0 - cosine.pow(2)).clamp(0, 1))
    phi = cosine * np.cos(m) - sine * np.sin(m)
    th, mm = np.cos(np.pi - m), np.sin(np.pi - m) * m
    phi = torch.where(cosine > th, phi, cosine - mm)
    one_hot = F.one_hot(torch.tensor(label), nc).float()
    ref = ((one_hot * phi + (1 - one_hot) * cosine) * s).numpy()

    out = MG.arc_margin_logits(jnp.asarray(emb), jnp.asarray(wt),
                               jnp.asarray(label), s=s, m=m)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_add_margin():
    rng = np.random.default_rng(12)
    b, d, nc = 4, 8, 6
    emb = rng.normal(size=(b, d)).astype(np.float32)
    wt = rng.normal(size=(nc, d)).astype(np.float32)
    label = rng.integers(0, nc, size=b)
    cosine = F.linear(F.normalize(torch.tensor(emb)), F.normalize(torch.tensor(wt)))
    one_hot = F.one_hot(torch.tensor(label), nc).float()
    ref = ((one_hot * (cosine - 0.4) + (1 - one_hot) * cosine) * 30.0).numpy()
    out = MG.add_margin_logits(jnp.asarray(emb), jnp.asarray(wt), jnp.asarray(label))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_adaface_logits_and_ema():
    rng = np.random.default_rng(13)
    b, d, nc = 8, 16, 10
    emb = rng.normal(size=(b, d)).astype(np.float32)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    kernel = rng.normal(size=(d, nc)).astype(np.float32)
    norms = rng.uniform(5, 40, size=(b, 1)).astype(np.float32)
    label = rng.integers(0, nc, size=b)

    out, new_mean, new_std = MG.adaface_logits(
        jnp.asarray(emb), jnp.asarray(kernel), jnp.asarray(norms),
        jnp.asarray(label), batch_mean=jnp.asarray(20.0),
        batch_std=jnp.asarray(100.0), t_alpha=1.0)
    # t_alpha=1 -> EMA equals this batch's stats
    assert float(new_mean) == pytest.approx(float(np.mean(norms)), rel=1e-5)
    assert float(new_std) == pytest.approx(float(np.std(norms, ddof=1)), rel=1e-4)
    assert out.shape == (b, nc)
    assert np.all(np.isfinite(np.asarray(out)))


def test_mag_margin_monotone_margin():
    rng = np.random.default_rng(14)
    b, d, nc = 6, 16, 8
    emb = rng.normal(size=(b, d)).astype(np.float32) * 20
    wt = rng.normal(size=(d, nc)).astype(np.float32)
    fn = MG.linear_margin_fn(0.45, 0.8, 10, 110)
    (cos_t, cos_tm), x_norm = MG.mag_margin_logits(
        jnp.asarray(emb), jnp.asarray(wt), fn)
    assert cos_t.shape == (b, nc)
    assert np.all(np.asarray(x_norm) >= 10) and np.all(np.asarray(x_norm) <= 110)
    # margined logits never exceed plain logits where cos>0 (easy margin)
    ct, ctm = np.asarray(cos_t), np.asarray(cos_tm)
    assert np.all(ctm[ct > 0] <= ct[ct > 0] + 1e-5)
    g = MG.mag_loss_g(x_norm)
    assert float(g) > 0


def test_sphere_margin_runs_and_anneals():
    rng = np.random.default_rng(15)
    b, d, nc = 4, 8, 6
    emb = rng.normal(size=(b, d)).astype(np.float32)
    wt = rng.normal(size=(nc, d)).astype(np.float32)
    label = rng.integers(0, nc, size=b)
    logits1, it1 = MG.sphere_margin_logits(jnp.asarray(emb), jnp.asarray(wt),
                                           jnp.asarray(label), 0)
    logits2, it2 = MG.sphere_margin_logits(jnp.asarray(emb), jnp.asarray(wt),
                                           jnp.asarray(label), it1)
    assert int(it1) == 1 and int(it2) == 2
    assert logits1.shape == (b, nc)
    assert np.all(np.isfinite(np.asarray(logits1)))


def test_margin_grads_finite_at_saturated_cosine():
    """Regression: a target cosine of EXACTLY +-1 must not NaN the backward.

    sqrt'(0) and arccos'(+-1) are infinite; with the old clip-to-0 floors a
    saturated target cosine emitted 0*inf = NaN gradients that poisoned
    every param group in one step (observed live at B=64, epoch 3 — the
    torch reference's `sqrt((1-cos^2).clamp(0,1))` carries the same latent
    cliff). Basis-vector embeddings make cos(theta)=1.0 bit-exact.
    """
    import jax

    b, d, nc = 4, 8, 6
    emb = np.zeros((b, d), np.float32)
    wt = np.zeros((nc, d), np.float32)
    label = np.arange(b)
    for i in range(b):
        emb[i, i] = 1.0          # e_i
        wt[i, i] = 1.0           # target class weight == embedding
    for j in range(b, nc):
        wt[j, j % d] = 0.7
    # antipodal case too: cos(theta) = -1 against class b-1
    emb[b - 1, b - 1] = -1.0

    def arc_loss(e, w):
        lg = MG.arc_margin_logits(e, w, jnp.asarray(label), s=35.0, m=0.5)
        return L.focal_loss(lg, jnp.asarray(label))

    ge, gw = jax.grad(arc_loss, argnums=(0, 1))(jnp.asarray(emb),
                                                jnp.asarray(wt))
    assert np.all(np.isfinite(np.asarray(ge))), "arc: d/demb has non-finite"
    assert np.all(np.isfinite(np.asarray(gw))), "arc: d/dweight has non-finite"

    def sphere_loss(e, w):
        lg, _ = MG.sphere_margin_logits(e, w, jnp.asarray(label), 0)
        return L.focal_loss(lg, jnp.asarray(label))

    ge, gw = jax.grad(sphere_loss, argnums=(0, 1))(jnp.asarray(emb),
                                                   jnp.asarray(wt))
    assert np.all(np.isfinite(np.asarray(ge))), "sphere: non-finite demb"
    assert np.all(np.isfinite(np.asarray(gw))), "sphere: non-finite dweight"

    def mag_loss(e, w):
        fn = MG.linear_margin_fn(0.45, 0.8, 10, 110)
        (ct, ctm), xn = MG.mag_margin_logits(e, w, fn)
        one_hot = jax.nn.one_hot(jnp.asarray(label), nc)
        lg = one_hot * ctm + (1 - one_hot) * ct
        return L.focal_loss(lg, jnp.asarray(label)) + MG.mag_loss_g(xn)

    ge, gw = jax.grad(mag_loss, argnums=(0, 1))(jnp.asarray(emb * 20.0),
                                                jnp.asarray(wt.T))
    assert np.all(np.isfinite(np.asarray(ge))), "mag: non-finite demb"
    assert np.all(np.isfinite(np.asarray(gw))), "mag: non-finite dweight"
