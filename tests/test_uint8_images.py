"""uint8-on-the-wire image mode (uint8_images=True): augmented uint8 RGB is
shipped to the device and normalized on-chip (ops/images.device_normalize).
The values must be IDENTICAL to the host-normalized float32 path — same ops,
same order — for the PIL path, the native C++ path, both dataset classes,
and a whole train step."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import prepare as prep
from text_guided_face_recognition_tpu.ops import device_normalize


def _args(**kw):
    base = dict(
        en_type="LSTM", synthetic=True, batch_size=4, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=0,
        is_DAMSM=True, is_CLIP=True, is_ident_loss=True, is_CMP=False)
    base.update(kw)
    return TGFRConfig().replace(**base)


@pytest.mark.parametrize("model_type", ["arcface", "adaface"])
def test_train_dataset_u8_equals_host_normalized(model_type):
    _, ds_f = prep.prepare_dataloader(_args(model_type=model_type), "train")
    _, ds_u = prep.prepare_dataloader(
        _args(model_type=model_type, uint8_images=True), "train")
    for _epoch in range(2):
        for i in (0, 3, 17):
            a = ds_f[i]
            b = ds_u[i]
            assert b["img"].dtype == np.uint8
            np.testing.assert_array_equal(a["caps"], b["caps"])
            dev = np.asarray(device_normalize(jnp.asarray(b["img"]),
                                              model_type))
            np.testing.assert_array_equal(a["img"], dev)


@pytest.mark.parametrize("model_type", ["arcface", "adaface"])
def test_test_dataset_u8_equals_host_normalized(model_type):
    _, ds_f = prep.prepare_dataloader(_args(model_type=model_type), "test")
    _, ds_u = prep.prepare_dataloader(
        _args(model_type=model_type, uint8_images=True), "test")
    a, b = ds_f[1], ds_u[1]
    for slot in ("img1", "img2"):
        assert b[slot].dtype == np.uint8
        dev = np.asarray(device_normalize(jnp.asarray(b[slot]), model_type))
        np.testing.assert_array_equal(a[slot], dev)


def test_native_u8_bitwise_parity(tmp_path):
    from text_guided_face_recognition_tpu.data import native
    if not native.available():
        pytest.skip("native dataio unavailable")
    assert native.supports_u8()  # the checked-in .so must be v2+
    from PIL import Image
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = rng.integers(0, 255, (150, 130, 3), np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    seeds = np.asarray([1, 2 ** 40, 7, 123456789], np.uint64)
    for train_aug in (False, True):
        kw = dict(seeds=seeds if train_aug else None, train_aug=train_aug)
        f = native.decode_batch(paths, 112, 112, bgr=False, **kw)
        u = native.decode_batch(paths, 112, 112, u8_out=True, **kw)
        assert u.dtype == np.uint8
        dev = np.asarray(device_normalize(jnp.asarray(u), "arcface"))
        np.testing.assert_array_equal(f, dev)
        fb = native.decode_batch(paths, 112, 112, bgr=True, **kw)
        devb = np.asarray(device_normalize(jnp.asarray(u), "adaface"))
        np.testing.assert_array_equal(fb, devb)


@pytest.mark.slow
def test_stage1_step_identical_with_u8_wire():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    import jax
    losses = {}
    for u8 in (False, True):
        tr = Stage1Trainer(_args(uint8_images=u8))
        batch = {k: v for k, v in next(iter(tr.train_dl)).items()
                 if k != "key"}
        assert (batch["img"].dtype == np.uint8) == u8
        _, m = tr._train_step(tr.state, batch, tr.backbone.variables,
                              jax.random.PRNGKey(0))
        losses[u8] = float(m["total_loss"])
    # same math, same order; only the cast site moves
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)
