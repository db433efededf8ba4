"""Regression tests for VERDICT r01 weak #2/#4/#6: eval forwards must not
re-trace on repeated calls, set_lr must actually change update magnitudes
(functionally), and cosine_pairs must match torch's per-vector eps clamp."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from text_guided_face_recognition_tpu.engine import optim
from text_guided_face_recognition_tpu.engine.evaluate import (
    _pair_scores,
    cosine_pairs,
)


class FakeBackbone(nn.Module):
    @nn.compact
    def __call__(self, img, train=False):
        g = nn.Dense(8, name="g")(img.reshape(img.shape[0], -1))
        lc = jnp.zeros((img.shape[0], 2, 2, 4))
        return g, lc


class FakeImageHead(nn.Module):
    @nn.compact
    def __call__(self, g, lc, train=False):
        return nn.Dense(8, name="p")(g), lc


class FakeRNN(nn.Module):
    @nn.compact
    def __call__(self, caps, cap_len, deterministic=True):
        emb = nn.Embed(16, 8, name="emb")(caps)
        return jnp.swapaxes(emb, 1, 2), emb.mean(axis=1)


def _run_once(rng):
    """Build FRESH module objects + params and score one batch."""
    bb, ih, te = FakeBackbone(), FakeImageHead(), FakeRNN()
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
    caps = jnp.asarray(rng.integers(0, 16, (2, 6)), jnp.int32)
    lens = jnp.full((2,), 6, jnp.int32)
    bv = bb.init(key, img)
    iv = ih.init(key, *bb.apply(bv, img))
    tv = te.init(key, caps, lens)
    return _pair_scores(bb, ih, te, None, None, "LSTM", "arcface", "concat",
                        bv, iv, tv["params"], {}, {},
                        img, img, caps, caps, lens, lens)


def test_pair_scores_no_retrace_across_rebuilt_modules():
    rng = np.random.default_rng(0)
    _run_once(rng)
    n_after_first = _pair_scores._cache_size()
    _run_once(rng)  # fresh module objects, same configs
    assert _pair_scores._cache_size() == n_after_first, (
        "eval forward re-traced on a repeated call with identical configs")


def test_set_lr_is_functional_and_scales_updates():
    params = {"text_head": {"w": jnp.ones((4,))}}

    class A:
        weight_decay = 0.0
        compat_frozen_text = False

    tx = optim.make_stage1_bert_tx(A())
    st = tx.init(params)
    st1 = optim.set_lr(st, "head", 0.1)
    assert optim.get_lr(st1, "head") == np.float32(0.1)
    # functional: the source state is untouched
    assert optim.get_lr(st, "head") == 0.0

    grads = {"text_head": {"w": jnp.full((4,), 0.5)}}
    upd1, _ = tx.update(grads, st1, params)
    st2 = optim.set_lr(st1, "head", 0.2)
    assert optim.get_lr(st1, "head") == np.float32(0.1)
    upd2, _ = tx.update(grads, st2, params)
    m1 = float(jnp.abs(upd1["text_head"]["w"]).sum())
    m2 = float(jnp.abs(upd2["text_head"]["w"]).sum())
    assert m1 > 0.0
    np.testing.assert_allclose(m2, 2.0 * m1, rtol=1e-6)


def test_cosine_pairs_matches_torch_per_vector_eps_clamp():
    import torch

    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 8)).astype(np.float32)
    b = rng.normal(size=(5, 8)).astype(np.float32)
    # one near-zero-norm row on each side (the clamp-semantics edge)
    a[1] = 1e-9
    b[3] = 0.0
    ours = np.asarray(cosine_pairs(jnp.asarray(a), jnp.asarray(b)))
    ref = torch.nn.CosineSimilarity(dim=1, eps=1e-6)(
        torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
