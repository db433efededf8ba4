"""Offline-real WordPiece tokenization (data/wordpiece.py, VERDICT r4 #5):
corpus-trained vocab, HF-contract encoding, tokenizer-tagged caption caches.
"""

import os
import pickle

import numpy as np
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.data import wordpiece
from text_guided_face_recognition_tpu.data.datasets import load_text_data_bert
from text_guided_face_recognition_tpu.data.tokenizers import get_bert_tokenizer

CAPS = [
    "the woman has big eyes and a pointy nose",
    "she has wavy brown hair and is smiling",
    "a young man with short black hair and a beard",
    "the man has a large forehead and small eyes",
    "this person has high cheekbones and wavy hair",
    "big eyes and a pointy chin with brown wavy hair",
]


def _mk_corpus(tmp_path, n_imgs=3, caps_per=2):
    os.makedirs(tmp_path / "train", exist_ok=True)
    os.makedirs(tmp_path / "valid", exist_ok=True)
    os.makedirs(tmp_path / "test", exist_ok=True)
    names = {"train": [f"{i}/{i}_1" for i in range(n_imgs)],
             "valid": ["90/90_1"], "test": ["91/91_1"]}
    for split, ns in names.items():
        with open(tmp_path / split / "filenames.pickle", "wb") as f:
            pickle.dump(ns, f)
        for n in ns:
            d = tmp_path / "text" / n.split("/")[0]
            os.makedirs(d, exist_ok=True)
            with open(tmp_path / "text" / (n + ".txt"), "w") as f:
                f.write("\n".join(CAPS[:caps_per]) + "\n")
    return names


def test_train_and_encode_contract(tmp_path):
    _mk_corpus(tmp_path)
    wp = wordpiece.load_or_train(str(tmp_path))
    assert wp is not None and wp.vocab_size > 10
    assert os.path.isfile(tmp_path / wordpiece.VOCAB_FILENAME)
    ids, mask = wp(CAPS[0], 12)
    assert ids.shape == (12,) and mask.shape == (12,)
    assert ids.dtype == np.int32 and mask.dtype == np.int32
    n = int(mask.sum())
    assert wp._tok.id_to_token(int(ids[0])) == "[CLS]"
    assert wp._tok.id_to_token(int(ids[n - 1])) == "[SEP]"
    assert (ids[n:] == wp.pad_id).all() and (mask[n:] == 0).all()
    # deterministic + second load reuses the cached vocab byte-for-byte
    ids2, _ = wordpiece.WordPieceTokenizer(
        str(tmp_path / wordpiece.VOCAB_FILENAME))(CAPS[0], 12)
    np.testing.assert_array_equal(ids, ids2)
    # truncation keeps the trailing [SEP] (HF contract)
    tids, tmask = wp(" ".join(CAPS), 8)
    assert int(tmask.sum()) == 8
    assert wp._tok.id_to_token(int(tids[7])) == "[SEP]"


def test_no_corpus_returns_none(tmp_path):
    assert wordpiece.load_or_train(str(tmp_path / "nope")) is None


def _args(tmp_path):
    return TGFRConfig().replace(data_dir=str(tmp_path), en_type="BERT",
                                bert_type="bert", bert_words_num=10,
                                captions_per_image=2)


def test_get_bert_tokenizer_prefers_wordpiece_over_hash(tmp_path,
                                                        monkeypatch):
    _mk_corpus(tmp_path)
    # force the HF path to fail even on machines with an HF cache
    import transformers
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("x")))
    with pytest.warns(UserWarning, match="WordPiece"):
        enc = get_bert_tokenizer(_args(tmp_path))
    assert getattr(enc, "cache_tag") == "-wordpiece"
    ids, mask = enc(CAPS[1], 10)
    assert ids.shape == (10,) and int(mask.sum()) > 2


def test_caption_cache_is_tokenizer_tagged(tmp_path, monkeypatch):
    """Switching tokenizers must never silently reuse another tokenizer's
    token cache: the pickle name carries the cache_tag."""
    _mk_corpus(tmp_path)
    import transformers
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("x")))
    args = _args(tmp_path)
    out = load_text_data_bert(str(tmp_path), args)
    assert os.path.isfile(tmp_path / "captions_bert-wordpiece.pickle")
    assert not os.path.isfile(tmp_path / "captions_bert.pickle")
    tr_names, tr_caps = out[0], out[1]
    assert len(tr_caps) == len(tr_names) * args.captions_per_image
    assert tr_caps[0].shape == (10,)


def test_hash_fallback_when_no_corpus(tmp_path, monkeypatch):
    """No corpus at all -> HashTokenizer with its own cache tag."""
    import transformers
    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("x")))
    args = _args(tmp_path / "absent")
    with pytest.warns(UserWarning, match="HashTokenizer"):
        enc = get_bert_tokenizer(args)
    assert getattr(enc, "cache_tag") == "-hash"
