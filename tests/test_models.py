"""Model zoo tests: golden shapes/dtypes (SURVEY.md §4) plus hard numeric
parity of the masked-LSTM against torch's PackedSequence and of the text-head
window mapping against torch conv semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu import models as M

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------------- backbones ----

def test_iresnet18_output_contract():
    net = M.iresnet18()
    x = jnp.zeros((2, 112, 112, 3))
    variables = net.init(KEY, x)
    (emb, local), _ = net.apply(variables, x, train=False,
                                mutable=["batch_stats"])
    assert emb.shape == (2, 512)
    assert local.shape == (2, 14, 14, 256)  # reference: models/iresnet.py:157


def test_iresnet_variants_layer_counts():
    # spot-check param structure scales with depth
    n18 = sum(1 for k in M.iresnet18().init(KEY, jnp.zeros((1, 112, 112, 3)))
              ["params"] if k.startswith("layer"))
    n50 = sum(1 for k in M.iresnet50().init(KEY, jnp.zeros((1, 112, 112, 3)))
              ["params"] if k.startswith("layer"))
    assert n18 == 8 and n50 == 24


def test_irbackbone_adaface_contract():
    net = M.build_model("ir_18")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 112, 112, 3)).astype(np.float32))
    variables = net.init(KEY, x)
    (gl, lc, norm), _ = net.apply(variables, x, train=False,
                                  mutable=["batch_stats"])
    assert gl.shape == (2, 512)
    assert lc.shape == (2, 14, 14, 256)  # body idx 5, reference net.py:326-327
    assert norm.shape == (2, 1)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(gl), axis=1),
                               np.ones(2), rtol=1e-5)


def test_magface_network_builder():
    from text_guided_face_recognition_tpu.models.magface import network_builder
    net = network_builder("iresnet18")
    assert isinstance(net, M.iresnet.__class__ if False else object)
    x = jnp.zeros((1, 112, 112, 3))
    variables = net.init(KEY, x)
    (emb, local), _ = net.apply(variables, x, mutable=["batch_stats"])
    assert emb.shape == (1, 512) and local.shape == (1, 14, 14, 256)


# ------------------------------------------------------------- image head ---

def test_image_heading_shapes_and_norms():
    head = M.ImageHeading(feat_dim=256)
    g = jnp.asarray(np.random.default_rng(0).normal(size=(4, 512)),
                    dtype=jnp.float32)
    l = jnp.asarray(np.random.default_rng(1).normal(size=(4, 14, 14, 256)),
                    dtype=jnp.float32)
    variables = head.init(KEY, g, l)
    (pg, pl), _ = head.apply(variables, g, l, train=False,
                             mutable=["batch_stats"])
    assert pg.shape == (4, 256) and pl.shape == (4, 14, 14, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pg), axis=-1),
                               np.ones(4), rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pl), axis=-1),
                               np.ones((4, 14, 14)), rtol=1e-4)


# ----------------------------------------------------------- text encoders --

def test_text_heading_matches_torch_conv_semantics():
    """BertWordMapping == Conv2d(1, F, (K, E)) + the reference's multi-scale
    word max-assembly (models/models.py:181-232), checked with shared weights."""
    rng = np.random.default_rng(0)
    B, T_in, E, Fdim = 3, 23, 32, 16   # T_in = bert_words_num - 1
    x = rng.normal(size=(B, T_in, E)).astype(np.float32)

    head = M.TextHeading(feat_dim=Fdim)
    variables = head.init(KEY, jnp.asarray(x))

    # copy flax dense kernels into torch conv weights
    convs = {}
    for K in (2, 3, 4):
        p = variables["params"]["bwm"][f"conv_k{K}"]
        w = np.asarray(p["kernel"])            # (K*E, F)
        b = np.asarray(p["bias"])
        conv = torch.nn.Conv2d(1, Fdim, (K, E))
        conv.weight.data = torch.tensor(
            w.T.reshape(Fdim, K, E)[:, None].reshape(Fdim, 1, K, E))
        conv.bias.data = torch.tensor(b)
        convs[K] = conv

    tx = torch.tensor(x).unsqueeze(1)          # (B, 1, T, E)
    scales = [F.relu(convs[K](tx)).squeeze(3) for K in (2, 3, 4)]  # (B, F, T-K+1)
    a, b_, c = [s.transpose(2, 1) for s in scales]                 # (B, T', F)

    # reference get_each_word_feature loop (models/models.py:197-213)
    seq = T_in - 3
    code = []
    for i in range(B):
        t = [torch.amax(torch.stack((a[i, j], b_[i, j], c[i, j])), dim=0)
             for j in range(seq)]
        t += [torch.amax(torch.stack((a[i, seq], b_[i, seq])), dim=0)]
        t += [a[i, seq + 1]]
        code.append(torch.stack(t))
    code = F.normalize(torch.stack(code), p=2, dim=2)
    ref_words = code.transpose(1, 2).detach().numpy()              # (B, F, T-1)

    pooled = [F.max_pool1d(s, s.size(2)).squeeze(2) for s in scales]
    ref_sent = F.normalize(torch.stack(pooled).mean(0), p=2,
                           dim=1).detach().numpy()

    words, sent = head.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(words), ref_words, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sent), ref_sent, atol=1e-5)


def test_text_encoder_output_contract():
    enc = M.TextEncoder(bert_type="groupvit")  # smallest arch for speed
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 24)))
    mask = jnp.ones((2, 24), jnp.int32)
    variables = enc.init(KEY, ids, mask)
    words, sent = enc.apply(variables, ids, mask)
    assert words.shape == (2, 23, 256)  # hidden[:, 1:, :]
    assert sent.shape == (2, 256)       # hidden[:, 0, :]


def test_rnn_encoder_matches_torch_packed_lstm():
    """Masked flax biLSTM == torch pack_padded_sequence biLSTM (inference),
    with weights copied across (SURVEY.md §7 hard part 2)."""
    rng = np.random.default_rng(0)
    V, B, T, E, H = 40, 5, 9, 300, 4  # H per direction
    caps = rng.integers(1, V, size=(B, T))
    lens = np.array([9, 7, 5, 3, 2])
    for i in range(B):
        caps[i, lens[i]:] = 0

    enc = M.RNNEncoder(vocab_size=V, en_type="LSTM", nhidden=2 * H)
    variables = enc.init(KEY, jnp.asarray(caps), jnp.asarray(lens))
    params = variables["params"]

    torch_lstm = torch.nn.LSTM(E, H, 1, batch_first=True, bidirectional=True)
    gate_order = ["i", "f", "g", "o"]

    def fill(direction, suffix):
        cell = params[direction]
        w_ih = np.concatenate(
            [np.asarray(cell[f"i{g}"]["kernel"]).T for g in gate_order], 0)
        w_hh = np.concatenate(
            [np.asarray(cell[f"h{g}"]["kernel"]).T for g in gate_order], 0)
        b = np.concatenate(
            [np.asarray(cell[f"h{g}"]["bias"]) for g in gate_order], 0)
        getattr(torch_lstm, f"weight_ih_l0{suffix}").data = torch.tensor(w_ih)
        getattr(torch_lstm, f"weight_hh_l0{suffix}").data = torch.tensor(w_hh)
        getattr(torch_lstm, f"bias_ih_l0{suffix}").data = torch.tensor(b)
        getattr(torch_lstm, f"bias_hh_l0{suffix}").data = torch.zeros(4 * H)

    fill("fwd", "")
    fill("bwd", "_reverse")

    emb_table = np.asarray(params["encoder"]["embedding"])
    emb = torch.tensor(emb_table[caps])  # (B, T, E)

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        emb, lens.tolist(), batch_first=True)
    with torch.no_grad():
        out, (h_n, _) = torch_lstm(packed)
    out = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True,
                                                 total_length=T)[0]
    ref_words = out.transpose(1, 2).numpy()                       # (B, 2H, T)
    ref_sent = h_n.transpose(0, 1).reshape(B, 2 * H).numpy()
    ref_sent = ref_sent / np.linalg.norm(ref_sent, axis=1, keepdims=True)

    words, sent = enc.apply(variables, jnp.asarray(caps), jnp.asarray(lens),
                            deterministic=True)
    np.testing.assert_allclose(np.asarray(words), ref_words, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sent), ref_sent, atol=2e-5)


def test_rnn_encoder_gru_runs():
    enc = M.RNNEncoder(vocab_size=30, en_type="GRU", nhidden=16)
    caps = jnp.asarray(np.random.default_rng(0).integers(1, 30, (3, 7)))
    lens = jnp.asarray([7, 4, 2])
    variables = enc.init(KEY, caps, lens)
    words, sent = enc.apply(variables, caps, lens)
    assert words.shape == (3, 16, 7) and sent.shape == (3, 16)


# ------------------------------------------------------------ fusion nets ---

def test_self_attention2d_matches_torch():
    """SelfAttention2D == reference conv-projected attention with the same
    weights (reference: models/fusion_nets.py:82-118)."""
    rng = np.random.default_rng(0)
    B, HW, C, scale = 2, 6, 8, 2
    x = rng.normal(size=(B, HW, HW, C)).astype(np.float32)
    y = rng.normal(size=(B, HW, HW, C)).astype(np.float32)

    from text_guided_face_recognition_tpu.models.layers import SelfAttention2D
    sa = SelfAttention2D(C, scale=scale)
    variables = sa.init(KEY, jnp.asarray(x), jnp.asarray(y))
    p = variables["params"]

    def torch_conv1x1(dense, cin, cout):
        conv = torch.nn.Conv2d(cin, cout, 1)
        conv.weight.data = torch.tensor(
            np.asarray(dense["kernel"]).T[:, :, None, None])
        conv.bias.data = torch.tensor(np.asarray(dense["bias"]))
        return conv

    qp = torch_conv1x1(p["query_proj"], C, C // scale)
    kp = torch_conv1x1(p["key_proj"], C, C // scale)
    vp = torch_conv1x1(p["value_proj"], C, C)

    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    ty = torch.tensor(y.transpose(0, 3, 1, 2))
    with torch.no_grad():
        q = qp(ty).reshape(B, C // scale, HW * HW)
        k = kp(tx).reshape(B, C // scale, -1).transpose(2, 1)
        attn = F.softmax(torch.bmm(k, q) / np.sqrt(C / scale), dim=-1)
        v = vp(tx).reshape(B, C, -1).transpose(2, 1)
        resp = torch.bmm(attn, v).permute(0, 2, 1).reshape(B, C, HW, HW)
    ref = resp.numpy().transpose(0, 2, 3, 1)

    out = sa.apply(variables, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_fcfm_output_640():
    net = M.FCFM(channel_dim=36)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 14, 14, 256)).astype(np.float32))
    word = jnp.asarray(rng.normal(size=(2, 256, 22)).astype(np.float32))
    gl = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    sent = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    variables = net.init(KEY, img, word, gl, sent)
    out, _ = net.apply(variables, img, word, gl, sent, train=False,
                       mutable=["batch_stats"])
    assert out.shape == (2, 640)  # 128 + 256 + 256 (reference :258)


def test_wordlevel_cfa_lstm_output_768():
    net = M.WordLevelCFA_LSTM(channel_dim=256)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 14, 14, 256)).astype(np.float32))
    word = jnp.asarray(rng.normal(size=(2, 256, 18)).astype(np.float32))
    variables = net.init(KEY, img, word)
    out = net.apply(variables, img, word)
    assert out.shape == (2, 768)


def test_linear_fusion_and_concat_attention():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    sent = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    lf = M.LinearFusion(fusion_final_dim=640)
    v = lf.init(KEY, img, sent)
    assert lf.apply(v, img, sent).shape == (2, 640)

    img512 = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    ca = M.ConcatAttention()
    v = ca.init(KEY, img512, sent)
    assert ca.apply(v, img512, sent).shape == (2, 512)


def test_paragraph_cfa():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    sent = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    net = M.ParagraphLevelCFA()
    v = net.init(KEY, img, sent)
    assert net.apply(v, img, sent).shape == (2, 64)


# ------------------------------------------------------------ margin heads --

def test_margin_modules_shapes():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, 4))

    arc = M.ArcMarginProduct(256, 10, s=30, m=0.5)
    v = arc.init(KEY, emb, label)
    assert arc.apply(v, emb, label).shape == (4, 10)

    add = M.AddMarginProduct(256, 10)
    v = add.init(KEY, emb, label)
    assert add.apply(v, emb, label).shape == (4, 10)

    sph = M.SphereProduct(256, 10)
    v = sph.init(KEY, emb, label)
    out, stats = sph.apply(v, emb, label, mutable=["margin_stats"])
    assert out.shape == (4, 10)
    assert float(stats["margin_stats"]["iter"]) == 1.0

    ada = M.AdaFaceHead(256, 10)
    norms = jnp.asarray(rng.uniform(5, 30, (4, 1)).astype(np.float32))
    v = ada.init(KEY, emb, norms, label)
    out, stats = ada.apply(v, emb, norms, label, mutable=["margin_stats"])
    assert out.shape == (4, 10)

    mag = M.MagLinear(256, 10)
    v = mag.init(KEY, emb)
    (ct, ctm), xn = mag.apply(v, emb)
    assert ct.shape == (4, 10) and xn.shape == (4, 1)
