"""AdaFace family optional surface: SE blocks, GNAP/GDC pooling heads."""

import numpy as np

import jax
import jax.numpy as jnp

from text_guided_face_recognition_tpu.models.irnet import (
    GDC,
    GNAP,
    IRBackbone,
    SEModule,
)

KEY = jax.random.PRNGKey(0)


def test_se_module_gates_channels():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 7, 7, 32)).astype(np.float32))
    se = SEModule(32, reduction=16)
    v = se.init(KEY, x)
    y = se.apply(v, x)
    assert y.shape == x.shape
    # sigmoid gate keeps magnitudes bounded by the input
    assert float(jnp.max(jnp.abs(y))) <= float(jnp.max(jnp.abs(x))) + 1e-5


def test_gnap_output():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 7, 7, 512)).astype(np.float32))
    m = GNAP()
    v = m.init(KEY, x)
    y, _ = m.apply(v, x, train=False, mutable=["batch_stats"])
    assert y.shape == (2, 512)
    assert np.all(np.isfinite(np.asarray(y)))


def test_gdc_output():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 7, 7, 512)).astype(np.float32))
    m = GDC(embedding_size=512)
    v = m.init(KEY, x)
    y, _ = m.apply(v, x, train=False, mutable=["batch_stats"])
    assert y.shape == (2, 512)


def test_ir_se_blocks_run():
    # SE-augmented backbone at depth 18 (the reference builders only name
    # ir_se_50+, but the block family is depth-agnostic)
    net = IRBackbone(num_layers=18, mode="ir_se")
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 112, 112, 3)).astype(np.float32))
    v = net.init(KEY, x)
    assert any("se" in str(k) for blk in v["params"].values()
               if isinstance(blk, dict) for k in blk)
    (gl, lc, norm), _ = net.apply(v, x, train=False,
                                  mutable=["batch_stats"])
    assert gl.shape == (1, 512) and lc.shape == (1, 14, 14, 256)
