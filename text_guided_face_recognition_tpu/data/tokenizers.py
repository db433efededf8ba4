"""Caption tokenization.

Two paths, mirroring the reference (reference: utils/dataset_utils.py):
  * LSTM path — regex word tokenizer (`\\w+`, lowercased, ASCII-filtered) +
    a corpus vocabulary with index 0 = '<end>' (reference:
    utils/dataset_utils.py:145-179, 258-303). Fully offline.
  * BERT path — a HuggingFace tokenizer per bert_type when available
    (reference: utils/dataset_utils.py:83-141). This machine has no network
    egress, so when the tokenizer (or its vocab) is not cached locally we fall
    back to a deterministic hash tokenizer with the same output contract
    (input_ids padded to `bert_words_num`, attention_mask) — documented in
    docs/DEVIATIONS.md; real deployments use the HF tokenizer.
"""

from __future__ import annotations

import re
import warnings
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = ["LstmTokenizer", "Vocabulary", "build_dictionary",
           "get_bert_tokenizer", "HashTokenizer"]

_WORD_RE = re.compile(r"\w+")


class LstmTokenizer:
    """RegexpTokenizer(r'\\w+') behavior: lowercase, keep alnum runs, drop
    non-ASCII characters per token (reference: utils/dataset_utils.py:156-168)."""

    def tokenize(self, caption: str) -> List[str]:
        caption = caption.replace("��", " ")
        tokens = _WORD_RE.findall(caption.lower())
        out = []
        for t in tokens:
            t = t.encode("ascii", "ignore").decode("ascii")
            if t:
                out.append(t)
        return out


@dataclass
class Vocabulary:
    """Corpus vocabulary; index 0 is '<end>' (reference:
    utils/dataset_utils.py:266-274)."""

    wordtoix: Dict[str, int] = field(default_factory=lambda: {"<end>": 0})
    ixtoword: Dict[int, str] = field(default_factory=lambda: {0: "<end>"})

    @property
    def n_words(self) -> int:
        return len(self.ixtoword)

    def add(self, word: str) -> int:
        if word not in self.wordtoix:
            ix = len(self.wordtoix)
            self.wordtoix[word] = ix
            self.ixtoword[ix] = word
        return self.wordtoix[word]

    def encode(self, tokens: Sequence[str]) -> List[int]:
        return [self.wordtoix[w] for w in tokens if w in self.wordtoix]


def build_dictionary(*caption_sets: Sequence[List[str]]
                     ) -> Tuple[List[List[List[int]]], Vocabulary]:
    """Build the vocabulary over all splits and re-encode captions
    (reference: utils/dataset_utils.py:258-303 — the >= 0 count threshold
    keeps every word, preserved)."""
    counts: Dict[str, float] = defaultdict(float)
    for caps in caption_sets:
        for sent in caps:
            for w in sent:
                counts[w] += 1
    vocab = Vocabulary()
    for w in counts:  # insertion order = first-seen order, like the reference
        vocab.add(w)
    encoded = [[vocab.encode(sent) for sent in caps] for caps in caption_sets]
    return encoded, vocab


class HashTokenizer:
    """Deterministic offline stand-in for a HF subword tokenizer.

    Same output contract as tokenizer.encode_plus(..., padding='max_length'):
    [CLS]-like id 101, [SEP]-like id 102, word tokens hashed into
    [1000, vocab_size), id 0 = PAD. Stable across runs/processes.
    """

    cls_id, sep_id, pad_id = 101, 102, 0

    def __init__(self, vocab_size: int = 30522):
        self.vocab_size = vocab_size

    def _hash(self, token: str) -> int:
        h = 2166136261
        for ch in token.encode("utf-8"):  # FNV-1a, process-stable
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return 1000 + h % (self.vocab_size - 1000)

    def __call__(self, caption: str, max_length: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        words = _WORD_RE.findall(caption.lower())
        ids = [self.cls_id] + [self._hash(w) for w in words]
        ids = ids[: max_length - 1] + [self.sep_id]
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        ids = ids + [self.pad_id] * pad
        mask = mask + [0] * pad
        return (np.asarray(ids, np.int32), np.asarray(mask, np.int32))


def get_bert_tokenizer(args):
    """BERT-family tokenizer per bert_type (reference:
    utils/dataset_utils.py:86-102). Returns a callable
    (caption, max_length) -> (input_ids, attention_mask) carrying a
    `cache_tag` attribute that namespaces the caption-pickle cache
    (different tokenizers must never silently share a token cache).

    Resolution order:
      1. the HF tokenizer (reference parity; needs network or an HF cache),
         cache_tag "" — the reference's captions_<bert_type>.pickle name
      2. a REAL WordPiece tokenizer trained offline on the caption corpus
         itself (data/wordpiece.py; true subword/row-reuse distribution,
         ids differ from the HF vocab), cache_tag "-wordpiece"
      3. the deterministic HashTokenizer (no corpus at all; synthetic id
         distribution), cache_tag "-hash"
    """
    name_by_type = {
        "bert": args.bert_config, "align": args.align_config,
        "clip": args.clip_config, "blip": args.blip_config,
        "falva": args.falva_config, "groupvit": args.groupvit_config,
    }
    name = name_by_type[args.bert_type]
    from text_guided_face_recognition_tpu.models.text_bert import TEXT_ARCHS
    arch_vocab = TEXT_ARCHS[args.bert_type].vocab_size
    try:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(name, local_files_only=True)

        def encode(caption: str, max_length: int):
            caption = caption.replace("��", " ")
            enc = tok(caption, add_special_tokens=True, max_length=max_length,
                      padding="max_length", truncation=True,
                      return_attention_mask=True)
            return (np.asarray(enc["input_ids"], np.int32),
                    np.asarray(enc["attention_mask"], np.int32))

        encode.cache_tag = ""
        return encode
    except Exception as e:  # offline / not cached
        hf_err = f"{type(e).__name__}"
    wp_why = "no caption corpus to train WordPiece on"
    try:
        from text_guided_face_recognition_tpu.data import wordpiece
        wp = wordpiece.load_or_train(args.data_dir, vocab_size=arch_vocab)
        if wp is not None and wp.vocab_size <= arch_vocab:
            warnings.warn(
                f"HF tokenizer {name!r} unavailable offline ({hf_err}); "
                "using corpus-trained WordPiece vocab "
                f"({wp.vocab_size} pieces, {wp.vocab_path})")
            return wp
        if wp is not None:
            # a pre-built wordpiece_vocab.txt in this data_dir is larger
            # than this arch's embedding table — loading it would emit
            # out-of-range token ids, but the user should be told the real
            # reason, not 'no corpus'
            wp_why = (f"existing WordPiece vocab {wp.vocab_path} has "
                      f"{wp.vocab_size} pieces > arch vocab {arch_vocab}")
    except Exception as e:
        wp_why = f"WordPiece fallback failed ({type(e).__name__}: {e})"
    warnings.warn(
        f"HF tokenizer {name!r} unavailable offline ({hf_err}) and "
        f"{wp_why}; using deterministic HashTokenizer fallback")
    ht = HashTokenizer(arch_vocab)
    fn = lambda caption, max_length: ht(caption, max_length)  # noqa: E731
    fn.cache_tag = "-hash"
    return fn
