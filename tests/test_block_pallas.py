"""Parity of the fused Pallas half-layer kernels (ops/block_pallas.py).

Kernels run in interpret mode on CPU (the model wiring auto-selects
interpret off-TPU). Compiled-vs-XLA parity inside the full train step on
the chip is covered by the A/B bench (tools/bench_stage_ab.py
`fusedblock` variants, docs/BENCHMARKS.md).

Coverage:
  * deterministic fwd + grads: fused _Block ("both") vs the unfused flax
    _Block with SHARED params (f32 tight, bf16 loose)
  * dropout mechanics: kernel vs a pure-jnp mirror of the documented math
    with the same uint32 bits (values and grads)
  * keep-probability statistics of the kernel dropout
  * param-tree identity between fused and unfused inits
  * TextEncoder end-to-end with fused_block + fused_dropout composed
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from text_guided_face_recognition_tpu.models import text_bert as tb
from text_guided_face_recognition_tpu.ops.block_pallas import (
    attn_block, ffn_block)

# intermediate=1024 -> TWO streamed K-blocks in the FFN kernels (the
# grid-accumulation path), d_head=64 like the flagship
ARCH = tb.TextArch(vocab_size=100, hidden=256, layers=2, heads=4,
                   intermediate=1024, max_positions=64)
B, T, H = 4, 12, 256


def _mk_inputs(dtype, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 2)
    x = jax.random.normal(k[0], (B, T, H), dtype)
    mask = jnp.asarray(np.array([[1] * T, [1] * (T - 3) + [0] * 3,
                                 [1] * (T - 5) + [0] * 5, [1] * T]), bool)
    return x, mask


def _init_block(dtype, fused_block="none"):
    blk = tb._Block(ARCH, dtype, False, fused_block, name="blk")
    x, mask = _mk_inputs(dtype)
    params = blk.init(jax.random.PRNGKey(7), x, mask, True)
    return blk, params, x, mask


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_fused_block_forward_matches_flax(dtype, tol):
    ref_blk, params, x, mask = _init_block(dtype, "none")
    out_ref = ref_blk.apply(params, x, mask, True)
    for mode in ("ffn", "attn", "both"):
        fused_blk = tb._Block(ARCH, dtype, False, mode, name="blk")
        out = fused_blk.apply(params, x, mask, True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(out_ref, np.float32),
            rtol=tol, atol=tol, err_msg=f"mode={mode}")


def test_fused_block_param_tree_identical():
    _, p_ref, _, _ = _init_block(jnp.float32, "none")
    _, p_fused, _, _ = _init_block(jnp.float32, "both")
    ref_paths = jax.tree_util.tree_structure(p_ref)
    fused_paths = jax.tree_util.tree_structure(p_fused)
    assert ref_paths == fused_paths
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_fused)):
        assert ka == kb and a.shape == b.shape and a.dtype == b.dtype
        # same init stream: identical values for identical paths
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-4),
                                       (jnp.bfloat16, 6e-2)])
def test_fused_block_grads_match_flax(dtype, tol):
    ref_blk, params, x, mask = _init_block(dtype, "none")
    fused_blk = tb._Block(ARCH, dtype, False, "both", name="blk")
    co = jax.random.normal(jax.random.PRNGKey(3), (B, T, H), jnp.float32)

    def loss(blk):
        def f(p, xx):
            out = blk.apply(p, xx, mask, True)
            return jnp.sum(out.astype(jnp.float32) * co)
        return f

    (g_ref, gx_ref) = jax.grad(loss(ref_blk), argnums=(0, 1))(params, x)
    (g_fus, gx_fus) = jax.grad(loss(fused_blk), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gx_fus, np.float32),
                               np.asarray(gx_ref, np.float32),
                               rtol=tol, atol=tol)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_fus)):
        name = jax.tree_util.keystr(kp)
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=tol, atol=tol * scale,
                                   err_msg=name)


# ---------------------------------------------------------------- dropout --

RATE = 0.25


def _thr(rate):
    return jnp.uint32(min(int(round(rate * (1 << 32))), (1 << 32) - 1))


def _mdrop(v, bits, rate, dt):
    keep = bits >= _thr(rate)
    return jnp.where(keep, v * jnp.asarray(1.0 / (1.0 - rate), dt),
                     jnp.zeros((), dt))


def _mirror_ffn(x2, w1, c1, w2, c2, g, b_, bits, rate, eps):
    dt = x2.dtype
    f = jnp.dot(x2, w1, preferred_element_type=jnp.float32).astype(dt) + c1
    a = jax.nn.gelu(f.astype(jnp.float32), approximate=False).astype(dt)
    gg = jnp.dot(a, w2, preferred_element_type=jnp.float32).astype(dt) + c2
    if rate > 0:
        gg = _mdrop(gg, bits, rate, dt)
    r = x2 + gg
    r32 = r.astype(jnp.float32)
    mean = jnp.mean(r32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r32 - mean), axis=-1, keepdims=True)
    z = (r32 - mean) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) \
        + b_.astype(jnp.float32)
    return z.astype(dt)


def _mirror_attn(x2, mask, wqkv, bqkv, wo, bo, g, b_, bits_p, bits_h,
                 heads, rate, eps):
    dt = x2.dtype
    n, h = x2.shape
    b, t = mask.shape
    d = h // heads
    qkv = jnp.dot(x2, wqkv, preferred_element_type=jnp.float32).astype(dt) \
        + bqkv
    q = qkv[:, :h].reshape(b, t, heads, d)
    k = qkv[:, h:2 * h].reshape(b, t, heads, d)
    v = qkv[:, 2 * h:].reshape(b, t, heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / np.sqrt(d)
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(mask[:, None, None, :] > 0, s, neg)
    p = jax.nn.softmax(s, axis=-1).astype(dt)            # (B, Hd, T, T)
    pd = p
    if rate > 0:
        # kernel layout: bits_p is (heads*B, T, T) head-major
        bits4 = bits_p.reshape(heads, b, t, t).transpose(1, 0, 2, 3)
        pd = _mdrop(p, bits4, rate, dt)
    o = jnp.einsum("bhqk,bkhd->bqhd", pd, v,
                   preferred_element_type=jnp.float32).astype(dt)
    o2 = o.reshape(n, h)
    hh = jnp.dot(o2, wo, preferred_element_type=jnp.float32).astype(dt) + bo
    if rate > 0:
        hh = _mdrop(hh, bits_h, rate, dt)
    r = x2 + hh
    r32 = r.astype(jnp.float32)
    mean = jnp.mean(r32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r32 - mean), axis=-1, keepdims=True)
    y = (r32 - mean) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) \
        + b_.astype(jnp.float32)
    return y.astype(dt)


def _rand_params(seed, shapes):
    ks = jax.random.split(jax.random.PRNGKey(seed), len(shapes))
    return [jax.random.normal(k, s, jnp.float32) * 0.05
            for k, s in zip(ks, shapes)]


def test_ffn_kernel_dropout_matches_mirror_values_and_grads():
    eps = 1e-12
    x2 = jax.random.normal(jax.random.PRNGKey(0), (B * T, H), jnp.float32)
    w1, c1, w2, c2 = _rand_params(1, [(H, 1024), (1024,), (1024, H), (H,)])
    g = jnp.ones((H,)) * 1.1
    b_ = jnp.ones((H,)) * 0.05
    bits = jax.random.bits(jax.random.PRNGKey(2), (B * T, H), jnp.uint32)

    seed0 = jnp.zeros((1, 1), jnp.int32)

    def f_kernel(x2, w1, c1, w2, c2, g, b_):
        return jnp.sum(ffn_block(x2, w1, c1, w2, c2, g, b_, bits, seed0,
                                 RATE, eps, False, True))

    def f_mirror(x2, w1, c1, w2, c2, g, b_):
        return jnp.sum(_mirror_ffn(x2, w1, c1, w2, c2, g, b_, bits,
                                   RATE, eps))

    zk = ffn_block(x2, w1, c1, w2, c2, g, b_, bits, seed0, RATE, eps,
                   False, True)
    zm = _mirror_ffn(x2, w1, c1, w2, c2, g, b_, bits, RATE, eps)
    np.testing.assert_allclose(np.asarray(zk), np.asarray(zm),
                               rtol=5e-5, atol=5e-5)

    gk = jax.grad(f_kernel, argnums=tuple(range(7)))(x2, w1, c1, w2, c2,
                                                     g, b_)
    gm = jax.grad(f_mirror, argnums=tuple(range(7)))(x2, w1, c1, w2, c2,
                                                     g, b_)
    for a, b in zip(gk, gm):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4 * scale)


def test_attn_kernel_dropout_matches_mirror_values_and_grads():
    eps = 1e-12
    heads = 4
    x2 = jax.random.normal(jax.random.PRNGKey(0), (B * T, H), jnp.float32)
    wqkv, bqkv, wo, bo = _rand_params(
        1, [(H, 3 * H), (3 * H,), (H, H), (H,)])
    g = jnp.ones((H,)) * 0.9
    b_ = jnp.zeros((H,))
    _, maskb = _mk_inputs(jnp.float32)
    mask = maskb.astype(jnp.int32)
    bits_p = jax.random.bits(jax.random.PRNGKey(5), (heads * B, T, T),
                             jnp.uint32)
    bits_h = jax.random.bits(jax.random.PRNGKey(6), (B * T, H), jnp.uint32)

    seed0 = jnp.zeros((1, 1), jnp.int32)

    def f_kernel(x2, wqkv, bqkv, wo, bo, g, b_):
        return jnp.sum(attn_block(x2, mask, wqkv, bqkv, wo, bo, g, b_,
                                  bits_p, bits_h, seed0, B, T, heads,
                                  RATE, eps, False, True))

    def f_mirror(x2, wqkv, bqkv, wo, bo, g, b_):
        return jnp.sum(_mirror_attn(x2, mask, wqkv, bqkv, wo, bo, g, b_,
                                    bits_p, bits_h, heads, RATE, eps))

    yk = attn_block(x2, mask, wqkv, bqkv, wo, bo, g, b_, bits_p, bits_h,
                    seed0, B, T, heads, RATE, eps, False, True)
    ym = _mirror_attn(x2, mask, wqkv, bqkv, wo, bo, g, b_, bits_p, bits_h,
                      heads, RATE, eps)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(ym),
                               rtol=5e-5, atol=5e-5)

    gk = jax.grad(f_kernel, argnums=tuple(range(7)))(x2, wqkv, bqkv, wo,
                                                     bo, g, b_)
    gm = jax.grad(f_mirror, argnums=tuple(range(7)))(x2, wqkv, bqkv, wo,
                                                     bo, g, b_)
    for a, b in zip(gk, gm):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4 * scale)


def test_kernel_dropout_keep_fraction():
    """Recover the mask the KERNEL actually applied from its output and
    check it element-for-element against the documented bits >= threshold
    definition (plus the keep-fraction statistic)."""
    eps = 1e-12
    x2 = jnp.ones((B * T, H), jnp.float32)
    w1 = jnp.zeros((H, 1024))
    w2 = jnp.zeros((1024, H))
    c1 = jnp.zeros((1024,))
    c2 = jnp.ones((H,))          # FFN output == 1 everywhere, pre-dropout
    g = jnp.ones((H,))
    b_ = jnp.zeros((H,))
    bits = jax.random.bits(jax.random.PRNGKey(9), (B * T, H), jnp.uint32)
    # residual r = x + drop(1) = 1 + {1/(1-RATE) kept, 0 dropped}; after the
    # per-row LN (g=1, b=0) kept elements sit strictly above the row mean and
    # dropped ones strictly below, so sign(z) IS the kernel's mask (each row
    # mixes both values: P(uniform row) ~ (3/4)^256 ~ 0).
    z = np.asarray(ffn_block(x2, w1, c1, w2, c2, g, b_, bits,
                             jnp.zeros((1, 1), jnp.int32), RATE, eps,
                             False, True))
    assert np.isfinite(z).all()
    kernel_keep = z > 0.0
    expected_keep = np.asarray(bits >= _thr(RATE))
    np.testing.assert_array_equal(kernel_keep, expected_keep)
    assert abs(kernel_keep.mean() - (1 - RATE)) < 0.02


def test_text_encoder_fused_block_composes_with_fused_dropout():
    enc = tb.TextEncoder(bert_type="bert", dtype=jnp.bfloat16,
                         fused_dropout=True, fused_block="both")
    ids = jnp.zeros((2, 24), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    words, sent = enc.apply(params, ids, mask, False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    assert words.shape == (2, 23, 768) and sent.shape == (2, 768)
    assert np.isfinite(np.asarray(words, np.float32)).all()


ENC_KW = dict(bert_type="bert", dtype=jnp.float32)


def _tiny_ids(bt=10, n=3):
    ids = jnp.asarray(np.arange(n * bt).reshape(n, bt) % 90, jnp.int32)
    mask = jnp.asarray(np.array([[1] * bt, [1] * (bt - 3) + [0] * 3,
                                 [1] * (bt - 1) + [0]]), jnp.int32)
    return ids, mask


def _small_enc(fused_block, dtype=jnp.float32, fused_dropout=False):
    # 2-layer small tower via a patched arch table entry
    return tb.TransformerEncoder(ARCH, dtype, False, fused_dropout,
                                 fused_block, name="model")


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_tower_forward_matches_flax(dtype, tol):
    ids, mask = _tiny_ids()
    ref = _small_enc("none", dtype)
    params = ref.init(jax.random.PRNGKey(11), ids, mask)
    out_ref = ref.apply(params, ids, mask, True)
    out_tower = _small_enc("tower", dtype).apply(params, ids, mask, True)
    np.testing.assert_allclose(np.asarray(out_tower, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=tol, atol=tol)


def test_tower_param_tree_identical():
    ids, mask = _tiny_ids()
    p_ref = _small_enc("none").init(jax.random.PRNGKey(3), ids, mask)
    p_tower = _small_enc("tower").init(jax.random.PRNGKey(3), ids, mask)
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_tower))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_tower)):
        assert ka == kb and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tower_grads_match_flax_deterministic():
    ids, mask = _tiny_ids()
    ref = _small_enc("none")
    tower = _small_enc("tower")
    params = ref.init(jax.random.PRNGKey(5), ids, mask)
    co = jax.random.normal(jax.random.PRNGKey(6),
                           (3, 10, ARCH.hidden), jnp.float32)

    def loss(enc):
        return lambda p: jnp.sum(
            enc.apply(p, ids, mask, True).astype(jnp.float32) * co)

    g_ref = jax.grad(loss(ref))(params)
    g_tow = jax.grad(loss(tower))(params)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_tow)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=jax.tree_util.keystr(kp))


def test_tower_dropout_equivalent_to_per_layer_fused():
    """With the fused_dropout plan both paths consume the SAME bit slices
    in the same per-layer order, so "tower" must reproduce "both" —
    masks included — to kernel-numerics tolerance (values AND grads)."""
    ids, mask = _tiny_ids()
    both = _small_enc("both", fused_dropout=True)
    tower = _small_enc("tower", fused_dropout=True)
    params = both.init(jax.random.PRNGKey(7), ids, mask)
    rngs = {"dropout": jax.random.PRNGKey(9)}
    out_b = both.apply(params, ids, mask, False, rngs=rngs)
    out_t = tower.apply(params, ids, mask, False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_b),
                               rtol=5e-5, atol=5e-5)

    co = jax.random.normal(jax.random.PRNGKey(8),
                           (3, 10, ARCH.hidden), jnp.float32)

    def loss(enc):
        return lambda p: jnp.sum(
            enc.apply(p, ids, mask, False, rngs=rngs) * co)

    g_b = jax.grad(loss(both))(params)
    g_t = jax.grad(loss(tower))(params)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_b),
            jax.tree_util.tree_leaves_with_path(g_t)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=jax.tree_util.keystr(kp))


def test_fused_block_falls_back_for_preln():
    enc = tb.TextEncoder(bert_type="clip", dtype=jnp.float32,
                         fused_block="both")
    ids = jnp.zeros((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    with pytest.warns(UserWarning, match="fused_block"):
        params = enc.init(jax.random.PRNGKey(0), ids, mask)
    words, sent = enc.apply(params, ids, mask, True)
    assert np.isfinite(np.asarray(words, np.float32)).all()


def test_fused_block_gate_requires_d_head_64():
    """blip (8 heads, d_head=96) must fall back to the unfused path: the
    kernels are only validated for d_head == 64 lane slices (ADVICE r3)."""
    enc = tb.TextEncoder(bert_type="blip", dtype=jnp.float32,
                         fused_block="both")
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    with pytest.warns(UserWarning, match="d_head"):
        params = enc.init(jax.random.PRNGKey(0), ids, mask)
        words, sent = enc.apply(params, ids, mask)
    assert np.isfinite(np.asarray(words, np.float32)).all()
    assert sent.shape == (2, 768)


def test_fused_block_rejects_unknown_mode():
    enc = tb.TextEncoder(bert_type="bert", dtype=jnp.float32,
                         fused_block="towre")
    ids = jnp.zeros((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    with pytest.raises(ValueError, match="towre"):
        enc.init(jax.random.PRNGKey(0), ids, mask)
