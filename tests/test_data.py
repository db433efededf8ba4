import os

import numpy as np
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.data import (
    DataLoader,
    LstmTokenizer,
    TestDataset,
    TrainDataset,
    build_dictionary,
)
from text_guided_face_recognition_tpu.data import transforms as T
from text_guided_face_recognition_tpu.data.tokenizers import HashTokenizer


def test_lstm_tokenizer_matches_reference_behavior():
    tok = LstmTokenizer()
    assert tok.tokenize("The woman has, BIG eyes!") == \
        ["the", "woman", "has", "big", "eyes"]
    # non-ascii stripped per token (reference: dataset_utils.py:164-168)
    assert tok.tokenize("café nose") == ["caf", "nose"]


def test_build_dictionary_end_token_zero():
    caps = [[["a", "b"], ["b", "c"]]]
    (enc,), vocab = build_dictionary(*caps)
    assert vocab.wordtoix["<end>"] == 0
    assert enc[0] == [1, 2] and enc[1] == [2, 3]
    assert vocab.n_words == 4


def test_hash_tokenizer_contract():
    ht = HashTokenizer(30522)
    ids, mask = ht("a man with short hair", 24)
    assert ids.shape == (24,) and mask.shape == (24,)
    assert ids[0] == 101 and mask.sum() == 7  # cls + 5 words + sep
    ids2, _ = ht("a man with short hair", 24)
    np.testing.assert_array_equal(ids, ids2)  # deterministic


def test_transforms_ranges():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
    out = T.eval_transform(img)
    assert out.dtype == np.float32 and out.shape == (112, 112, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # adaface BGR permute
    bgr = T.eval_transform(img, model_type="adaface")
    np.testing.assert_allclose(bgr[..., 0], out[..., 2])
    # grayscale branch forces all channels equal
    tr = T.train_transform(img, np.random.default_rng(3))  # p=0.2 path varies
    assert tr.shape == (112, 112, 3)


def _mk_args(tmp_path, en_type="LSTM"):
    return TGFRConfig().replace(
        data_dir=str(tmp_path), en_type=en_type, img_size=112,
        captions_per_image=2, lstm_words_num=6, bert_words_num=8,
        num_classes=10)


def test_train_dataset_lstm_synthetic(tmp_path):
    args = _mk_args(tmp_path)
    names = [f"id{i}_0" for i in range(8)]
    caps = [[1 + (i % 5), 2, 3] for i in range(len(names) * 2)]
    ds = TrainDataset(names, caps, args=args, synthetic=True)
    s = ds[3]
    assert s["img"].shape == (112, 112, 3)
    assert s["caps"].shape == (6,) and s["cap_len"] == 3
    assert 0 <= s["cls_id"] < 10


def test_train_dataset_bert_index_fix(tmp_path):
    args = _mk_args(tmp_path, "BERT")
    names = ["a_0", "b_0"]
    # captions laid out [img0_cap0, img0_cap1, img1_cap0, img1_cap1]
    caps = [np.full(8, i, np.int32) for i in range(4)]
    masks = [np.ones(8, np.int32) for _ in range(4)]
    ds = TrainDataset(names, caps, masks, args=args, synthetic=True, seed=0)
    # fixed behavior: image 1's caption ids must come from {2, 3}
    vals = {int(ds[1]["caps"][0]) for _ in range(10)}
    assert vals <= {2, 3}
    # compat flag reproduces the reference bug ({0, 1} regardless of index)
    args_bug = args.replace(compat_bert_caption_bug=True)
    ds_bug = TrainDataset(names, caps, masks, args=args_bug, synthetic=True)
    vals = {int(ds_bug[1]["caps"][0]) for _ in range(10)}
    assert vals <= {0, 1}


def test_classifier_coverage_guard_is_trainer_side(tmp_path):
    """Undersized num_classes must NOT block dataset construction (eval/
    serving consumers like engine/extract.py build train-split datasets with
    no classifier); the guard fires only via check_classifier_coverage,
    which the trainers call (ADVICE r4)."""
    args = _mk_args(tmp_path).replace(num_classes=3)
    names = [f"id{i}_0" for i in range(8)]
    caps = [[1, 2, 3] for _ in range(len(names) * 2)]
    ds = TrainDataset(names, caps, args=args, synthetic=True)
    ds.class_id = list(range(8))  # ids reach 7 >= num_classes=3
    _ = ds[0]  # extraction-style consumption still works
    with pytest.raises(ValueError, match="num_classes"):
        ds.check_classifier_coverage(args.num_classes)
    ds.check_classifier_coverage(8)  # exact cover passes


def test_test_dataset_synthetic_pairs_and_loader(tmp_path):
    args = _mk_args(tmp_path)
    names = [f"id{i}_0" for i in range(8)]
    caps = [[1, 2, 3, 4] for _ in range(len(names) * 2)]
    from text_guided_face_recognition_tpu.data.tokenizers import Vocabulary
    vocab = Vocabulary()
    [vocab.add(w) for w in "abcd"]
    ds = TestDataset(names, caps, vocab=vocab, args=args, synthetic=True)
    assert len(ds) == 8 * 4
    s = ds[0]
    assert s["img1"].shape == (112, 112, 3)
    assert s["pair_label"] == 1 and ds[1]["pair_label"] == 0

    dl = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False)
    batches = list(dl)
    assert len(batches) == 4
    assert batches[0]["img1"].shape == (8, 112, 112, 3)
    assert batches[0]["cap1"].shape == (8, 6)


def test_bert_cache_reads_reference_torch_format(tmp_path):
    """load_text_data_bert must accept the reference's torch-tensor pickle
    layout (utils/dataset_utils.py:195-198) as well as our numpy layout."""
    import pickle
    import torch
    from text_guided_face_recognition_tpu.data import load_text_data_bert

    # minimal split metadata
    for split, n in (("train", 2), ("valid", 1), ("test", 1)):
        d = tmp_path / split
        d.mkdir()
        with open(d / "filenames.pickle", "wb") as f:
            pickle.dump([f"{split}{i}_0" for i in range(n)], f)

    def torch_caps(n):
        return ([torch.arange(8, dtype=torch.long) + i for i in range(n * 2)],
                [torch.ones(8, dtype=torch.long) for _ in range(n * 2)])

    tr_c, tr_m = torch_caps(2)
    va_c, va_m = torch_caps(1)
    te_c, te_m = torch_caps(1)
    with open(tmp_path / "captions_bert.pickle", "wb") as f:
        pickle.dump([tr_c, tr_m, va_c, va_m, te_c, te_m], f, protocol=2)

    args = _mk_args(tmp_path, "BERT")
    out = load_text_data_bert(str(tmp_path), args)
    names, caps, masks = out[0], out[1], out[2]
    assert names == ["train0_0", "train1_0"]
    assert caps[1].dtype == np.int32 and caps[1].shape == (8,)
    np.testing.assert_array_equal(caps[1], np.arange(8) + 1)


def test_real_pair_list_keeps_explicit_test_sub(tmp_path):
    """A REAL pair list under synthetic images (protocol-scale runs: real
    test_299_sub.txt + --synthetic) must keep the caller's test_sub — before
    r5 prepare_dataloader clobbered it to len(ds)//4 whenever images were
    synthetic, turning the 300-wide identification groups into garbage
    4-wide ones (surfaced by the r5 chain soak printing 'total subjects:
    89475' for the 1,193-subject protocol)."""
    from text_guided_face_recognition_tpu.engine import prepare as prep

    # synthetic test names are s{i}_0 (engine/prepare._synthetic_lstm)
    pair_file = tmp_path / "pairs_real.txt"
    n_sub, width = 4, 6
    lines = []
    for s in range(n_sub):
        for j in range(width):
            lines.append(f"s{s}_0.jpg s{(s + j) % 8}_0.jpg {int(j == 0)}")
    pair_file.write_text("\n".join(lines) + "\n")

    args = _mk_args(tmp_path).replace(
        synthetic=True, is_ident=True, test_sub=n_sub,
        test_pair_list=str(pair_file), num_workers=2, batch_size=4)
    dl, ds = prep.prepare_dataloader(args, "test")
    assert ds.synthetic_pairs is False
    assert len(ds) == n_sub * width
    assert args.test_sub == n_sub  # NOT clobbered to len(ds)//4

    # control: no pair-list file -> synthetic 4-wide groups -> the len//4
    # inference is correct and must still fire
    args2 = _mk_args(tmp_path).replace(
        synthetic=True, is_ident=True, test_sub=1193,
        test_pair_list=str(tmp_path / "missing.txt"), num_workers=2,
        batch_size=4)
    dl2, ds2 = prep.prepare_dataloader(args2, "test")
    assert ds2.synthetic_pairs is True
    assert args2.test_sub == len(ds2) // 4


def test_dataloader_shuffle_drop_last(tmp_path):
    args = _mk_args(tmp_path)
    names = [f"id{i}_0" for i in range(10)]
    caps = [[1, 2] for _ in range(20)]
    ds = TrainDataset(names, caps, args=args, synthetic=True)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == 2  # 10 // 4
    assert batches[0]["caps"].shape == (4, 6)
    keys = [k for b in batches for k in b["key"].tolist()]
    assert len(set(keys)) == 8  # no duplicates within an epoch


def test_train_dataset_rejects_class_ids_beyond_num_classes(tmp_path):
    """Labels >= num_classes silently NaN the dense margin CE
    (take_along_axis fill mode) and silently drop the target logit under
    partial-FC — the TRAINERS must fail loudly via check_classifier_coverage
    (construction itself stays permissive for eval/serving consumers,
    ADVICE r4; see test_classifier_coverage_guard_is_trainer_side)."""
    import os
    import pickle

    args = _mk_args(tmp_path)  # num_classes=10
    names = [f"id{i}_0" for i in range(4)]
    caps = [[1, 2, 3] for _ in range(len(names) * 2)]
    os.makedirs(tmp_path / "train", exist_ok=True)
    with open(tmp_path / "train" / "class_info.pickle", "wb") as f:
        pickle.dump([0, 5, 99, 3], f)  # 99 >= num_classes
    ds = TrainDataset(names, caps, args=args, synthetic=True, split="train")
    with pytest.raises(ValueError, match="num_classes"):
        ds.check_classifier_coverage(args.num_classes)
