"""Frozen-backbone feature cache (engine/feature_cache.py): exactness of the
RNG re-derivation (augmentation + caption draws stay identical in cache
mode), the precompute itself (padded chunks match a direct forward), and
trainer-level equivalence (an epoch with frozen_feature_cache=True produces
the same losses as the in-step backbone path)."""

import numpy as np
import pytest

import jax

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import prepare as prep


def _args(**kw):
    base = dict(
        en_type="LSTM", synthetic=True, batch_size=4, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=0,
        is_DAMSM=True, is_CLIP=True, is_ident_loss=True, is_CMP=False)
    base.update(kw)
    return TGFRConfig().replace(**base)


def _fresh_train_ds(args):
    _, ds = prep.prepare_dataloader(args, "train")
    return ds


def test_peek_matches_getitem_and_keeps_visits():
    ds = _fresh_train_ds(_args())
    # peek is repeatable (no visit bump) and equals the NEXT __getitem__ image
    p1 = ds.peek_augmented_image(3)
    p2 = ds.peek_augmented_image(3)
    np.testing.assert_array_equal(p1, p2)
    assert 3 not in ds._visits
    got = ds[3]
    np.testing.assert_array_equal(p1, got["img"])
    # after the visit, peek sees the NEXT epoch's augmentation stream
    p3 = ds.peek_augmented_image(3)
    assert ds._visits[3] == 0
    nxt = ds[3]
    np.testing.assert_array_equal(p3, nxt["img"])


@pytest.mark.parametrize("en_type", ["LSTM", "BERT"])
def test_cache_mode_caption_draws_identical(en_type):
    kw = dict(en_type=en_type)
    if en_type == "BERT":
        kw.update(bert_type="groupvit")
    a = _args(**kw)
    ds_plain = _fresh_train_ds(a)
    ds_cached = _fresh_train_ds(a)
    n = len(ds_cached)
    fake = {"gl": np.arange(n, dtype=np.float32)[:, None] * [1.0, 2.0],
            "lc": np.arange(n, dtype=np.float32)[:, None] * [3.0]}
    ds_cached.set_feature_cache(fake)
    for _epoch in range(2):  # visit counter advances identically
        for i in range(n):
            ref = ds_plain[i]
            got = ds_cached[i]
            assert "img" not in got
            np.testing.assert_array_equal(got["img_gl"], fake["gl"][i])
            np.testing.assert_array_equal(got["img_lc"], fake["lc"][i])
            np.testing.assert_array_equal(ref["caps"], got["caps"])
            assert ref["cls_id"] == got["cls_id"]
            if en_type == "LSTM":
                assert ref["cap_len"] == got["cap_len"]
            else:
                np.testing.assert_array_equal(ref["mask"], got["mask"])


def test_refresh_matches_direct_forward_with_padding():
    from text_guided_face_recognition_tpu.engine.feature_cache import (
        FrozenFeatureCache)
    a = _args(feature_cache_batch=24)  # 64 synthetic items -> padded tail
    ds = _fresh_train_ds(a)
    backbone = prep.prepare_backbone(a)
    cache = FrozenFeatureCache(backbone, a)
    cache.refresh(ds, backbone.variables)
    n = len(ds)
    assert cache.gl.shape[0] == n and cache.lc.shape[0] == n
    assert ds._feature_cache is not None
    # spot-check rows (incl. the padded final chunk) against a direct apply;
    # peek after refresh sees the same not-yet-visited augmentation
    for i in (0, 23, 24, 63):
        img = ds.peek_augmented_image(i)
        out = backbone.module.apply(backbone.variables, img[None],
                                    train=False)
        # batch-24 vs batch-1 programs tile convs differently -> fp
        # reassociation noise (measured max rel ~4.5e-4 on CPU)
        np.testing.assert_allclose(np.asarray(out[0][0]), cache.gl[i],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out[1][0]), cache.lc[i],
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_stage1_epoch_equivalent_with_cache():
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    out = {}
    for cached in (False, True):
        tr = Stage1Trainer(_args(frozen_feature_cache=cached,
                                 feature_cache_batch=16, max_steps=3))
        out[cached] = tr.train_epoch(1)
    assert np.isfinite(out[True]["total_loss"])
    np.testing.assert_allclose(out[True]["total_loss"],
                               out[False]["total_loss"], rtol=2e-5)


@pytest.mark.slow
def test_stage2_epoch_equivalent_with_cache():
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    out = {}
    for cached in (False, True):
        tr = FusionTrainer(_args(
            fusion_type="linear", CONFIG_NAME="Fusion", lr_image_train=0.1,
            loss="focal_loss", frozen_feature_cache=cached,
            feature_cache_batch=16, max_steps=3))
        out[cached] = tr.train_epoch(1)
    assert np.isfinite(out[True]["loss"])
    np.testing.assert_allclose(out[True]["loss"], out[False]["loss"],
                               rtol=2e-5)
