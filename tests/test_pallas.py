"""Pallas DAMSM kernel: numerical parity with the jnp reference path
(interpret mode on the CPU mesh) and custom-VJP gradient parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu.ops.attention import damsm_similarity
from text_guided_face_recognition_tpu.ops import damsm_pallas as DP

_ORIG = DP.damsm_similarity_pallas


def _data(seed, b=8, d=32, t=6, r=49):
    rng = np.random.default_rng(seed)
    words = jnp.asarray(rng.normal(size=(b, d, t)).astype(np.float32))
    regions = jnp.asarray(rng.normal(size=(b, d, r)).astype(np.float32))
    lens = rng.integers(2, t + 1, b)
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    return words, regions, mask


@pytest.mark.parametrize("masked", [True, False])
def test_pallas_forward_matches_jnp(masked):
    words, regions, mask = _data(0)
    mask = mask if masked else None
    ref = damsm_similarity(words, regions, 4.0, 5.0, mask)
    out = _ORIG(words, regions, 4.0, 5.0, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_custom_vjp_gradients_match(monkeypatch):
    # route the fused op's forward through interpret mode on CPU
    monkeypatch.setattr(
        DP, "damsm_similarity_pallas",
        lambda *a, **k: _ORIG(*a, **{**k, "interpret": True}))
    words, regions, mask = _data(1)

    def loss_fused(w, r):
        return jnp.sum(jnp.tanh(
            DP.damsm_similarity_fused(w, r, 4.0, 5.0, mask)))

    def loss_ref(w, r):
        return jnp.sum(jnp.tanh(damsm_similarity(w, r, 4.0, 5.0, mask)))

    out_f = loss_fused(words, regions)
    out_r = loss_ref(words, regions)
    assert float(out_f) == pytest.approx(float(out_r), rel=1e-5)

    gw_f, gr_f = jax.grad(loss_fused, argnums=(0, 1))(words, regions)
    gw_r, gr_r = jax.grad(loss_ref, argnums=(0, 1))(words, regions)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_r), atol=2e-5)
