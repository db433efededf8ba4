"""Validation against the REAL shipped Face2Text metadata (read-only from the
reference checkout): pickle formats, caption files, tokenization and vocab
building on the actual corpus. Skipped when the reference isn't mounted."""

import os

import numpy as np
import pytest

REF = "/root/reference/data/face2text"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference dataset not mounted")

from text_guided_face_recognition_tpu.data.datasets import (  # noqa: E402
    load_captions,
    load_class_id,
    load_filenames,
)
from text_guided_face_recognition_tpu.data.tokenizers import (  # noqa: E402
    build_dictionary,
)


def test_load_real_filenames_and_classes():
    names = load_filenames(REF, "valid")
    cls = load_class_id(os.path.join(REF, "valid"))
    assert len(names) == 1530  # SURVEY.md §2.11
    assert len(cls) == len(names)
    # keys carry the identity dir prefix and match their class ids
    for n, c in zip(names[:50], cls[:50]):
        ident, stem = n.split("/")
        assert stem.startswith(ident + "_")
        assert int(ident) == c
    assert min(cls) == 4500 and max(cls) == 4999  # valid split identities


def test_load_real_captions_and_vocab():
    names = load_filenames(REF, "valid")[:200]
    caps = load_captions(REF, names, embeddings_num=4)
    assert len(caps) == len(names) * 4
    assert all(len(c) > 0 for c in caps)
    assert all(w == w.lower() and w.isascii() for c in caps[:50] for w in c)

    (enc,), vocab = build_dictionary(caps)
    assert vocab.wordtoix["<end>"] == 0
    assert vocab.n_words > 100
    # round-trip: encoded ids decode to the original tokens
    for tokens, ids in zip(caps[:20], enc[:20]):
        assert [vocab.ixtoword[i] for i in ids] == tokens


def test_real_caption_lengths_fit_config():
    names = load_filenames(REF, "valid")[:300]
    caps = load_captions(REF, names, embeddings_num=4)
    lens = np.asarray([len(c) for c in caps])
    # lstm_words_num=18 truncation hits some captions but not the bulk
    assert lens.min() >= 1
    assert np.median(lens) > 5
