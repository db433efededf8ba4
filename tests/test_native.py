"""Native C++ data loader: PIL parity at production shapes, deterministic
augmentation, and dataset integration (skipped when the toolchain is absent)."""

import os

import numpy as np
import pytest

from text_guided_face_recognition_tpu.data import native as N
from text_guided_face_recognition_tpu.data.transforms import (
    decode_image,
    eval_transform,
)

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native dataio not built")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
        p = str(d / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def test_eval_path_matches_pil_exactly(jpeg_dir):
    out = N.decode_batch(jpeg_dir, 112, 112)
    ref = np.stack([eval_transform(decode_image(p, 112)) for p in jpeg_dir])
    np.testing.assert_array_equal(out, ref)


def test_bgr_matches_adaface_transform(jpeg_dir):
    out = N.decode_batch(jpeg_dir[:2], 112, 112, bgr=True)
    ref = np.stack([eval_transform(decode_image(p, 112), model_type="adaface")
                    for p in jpeg_dir[:2]])
    np.testing.assert_array_equal(out, ref)


def test_train_aug_deterministic_and_valid(jpeg_dir):
    seeds = np.arange(len(jpeg_dir), dtype=np.uint64) + 3
    a = N.decode_batch(jpeg_dir, 112, 112, seeds=seeds, train_aug=True)
    b = N.decode_batch(jpeg_dir, 112, 112, seeds=seeds, train_aug=True,
                       n_threads=2)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -1.0 and a.max() <= 1.0
    # different seeds must eventually produce different augmentations
    c = N.decode_batch(jpeg_dir, 112, 112,
                       seeds=seeds + 1000, train_aug=True)
    assert not np.array_equal(a, c)


def test_failed_decode_zero_fills(jpeg_dir, tmp_path):
    bogus = str(tmp_path / "missing.jpg")
    with pytest.warns(UserWarning, match="failed to decode"):
        out = N.decode_batch([jpeg_dir[0], bogus], 112, 112)
    assert np.all(out[1] == 0)
    assert np.any(out[0] != 0)


def test_dataset_uses_native_path(jpeg_dir, tmp_path):
    """TrainDataset with real files picks the native fused path and produces
    the same tensors as the PIL path with the same RNG stream."""
    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.data import TrainDataset

    # lay out data_dir/images/train/<key>.jpg
    img_dir = tmp_path / "images" / "train"
    os.makedirs(img_dir)
    keys = []
    for i, p in enumerate(jpeg_dir):
        key = f"k{i}_0"
        os.link(p, img_dir / f"{key}.jpg")
        keys.append(key)
    # class pickle
    import pickle
    os.makedirs(tmp_path / "train", exist_ok=True)
    with open(tmp_path / "train" / "class_info.pickle", "wb") as f:
        pickle.dump(list(range(len(keys))), f)

    args = TGFRConfig().replace(data_dir=str(tmp_path), en_type="LSTM",
                                img_size=112, captions_per_image=1,
                                lstm_words_num=6, num_classes=10)
    caps = [[1, 2, 3]] * len(keys)
    ds = TrainDataset(keys, caps, args=args, seed=0)
    assert ds._native_ok()
    s = ds[0]
    assert s["img"].shape == (112, 112, 3)
    assert s["img"].min() >= -1.0 and s["img"].max() <= 1.0
