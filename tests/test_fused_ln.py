"""Parity of the fused Pallas LayerNorm (ops/layernorm_pallas.py).

Runs the kernels in interpret mode on CPU; compiled-vs-XLA step parity on
the chip is covered by the A/B bench (tools/bench_opt_ab.py `fusedln`
variant, docs/BENCHMARKS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_guided_face_recognition_tpu.ops.layernorm_pallas import (
    layernorm_fused)


def _ref_ln(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b
    return y.astype(x.dtype)


@pytest.mark.parametrize("shape,dtype", [
    ((8, 24, 768), jnp.float32),
    ((8, 24, 768), jnp.bfloat16),
    ((16, 256), jnp.float32),     # n=16 -> single sub-_BLOCK_ROWS block
    ((40, 24, 512), jnp.bfloat16),  # n=960 -> non-256 divisor block
])
def test_fused_ln_forward_matches_reference(shape, dtype):
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    h = shape[-1]
    x = jax.random.normal(k[0], shape, dtype)
    g = jax.random.normal(k[1], (h,), jnp.float32) * 0.2 + 1.0
    b = jax.random.normal(k[2], (h,), jnp.float32) * 0.1
    eps = 1e-12
    got = layernorm_fused(x, g, b, eps, True)
    want = _ref_ln(x, g, b, eps)
    assert got.dtype == x.dtype
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ln_grads_match_autodiff_of_reference(dtype):
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    shape, h, eps = (4, 24, 768), 768, 1e-12
    x = jax.random.normal(k[0], shape, dtype)
    g = jax.random.normal(k[1], (h,), jnp.float32) * 0.2 + 1.0
    b = jax.random.normal(k[2], (h,), jnp.float32) * 0.1
    co = jax.random.normal(k[3], shape, jnp.float32)  # fixed cotangent seed

    def loss_fused(x, g, b):
        return jnp.sum(layernorm_fused(x, g, b, eps, True).astype(
            jnp.float32) * co)

    def loss_ref(x, g, b):
        return jnp.sum(_ref_ln(x, g, b, eps).astype(jnp.float32) * co)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    tol = 1e-4 if dtype == jnp.float32 else 3e-2
    for a, w, nm in zip(got, want, ("dx", "dgamma", "dbeta")):
        assert a.dtype == w.dtype, nm
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=tol, atol=tol, err_msg=nm)


def test_fused_ln_module_swaps_cleanly_with_nn_layernorm():
    """FusedLayerNorm must expose the exact nn.LayerNorm param tree
    (scale/bias) so checkpoints and converters are interchangeable, and
    match its values at fp32."""
    from flax import linen as nn

    from text_guided_face_recognition_tpu.models.text_bert import (
        FusedLayerNorm)

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 24, 256))
    fused = FusedLayerNorm(epsilon=1e-5)
    ref = nn.LayerNorm(epsilon=1e-5)
    vf = fused.init(jax.random.PRNGKey(3), x)
    vr = ref.init(jax.random.PRNGKey(3), x)
    assert (jax.tree_util.tree_structure(vf)
            == jax.tree_util.tree_structure(vr))
    # non-trivial params: run fused with nn.LayerNorm's initialized tree
    vr = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jnp.arange(p.size, dtype=p.dtype).reshape(p.shape)
        / p.size, vr)
    np.testing.assert_allclose(np.asarray(fused.apply(vr, x)),
                               np.asarray(ref.apply(vr, x)),
                               rtol=2e-6, atol=2e-6)


def test_text_encoder_fused_ln_param_tree_identical():
    """fused_ln=True must not change the TextEncoder param tree (checkpoint
    compatibility), and the forward must match at fp32."""
    from text_guided_face_recognition_tpu.models.text_bert import TextEncoder

    ids = jnp.zeros((2, 24), jnp.int32).at[:, :8].set(5)
    mask = jnp.zeros((2, 24), jnp.int32).at[:, :8].set(1)
    a = TextEncoder(bert_type="groupvit", dtype=jnp.float32, fused_ln=False)
    bmod = TextEncoder(bert_type="groupvit", dtype=jnp.float32, fused_ln=True)
    va = a.init(jax.random.PRNGKey(0), ids, mask)
    vb = bmod.init(jax.random.PRNGKey(0), ids, mask)
    assert (jax.tree_util.tree_structure(va)
            == jax.tree_util.tree_structure(vb))
    wa, sa = a.apply(va, ids, mask)
    wb, sb = bmod.apply(va, ids, mask)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                               rtol=3e-5, atol=3e-5)
