"""Datasets: caption/identity metadata + image loading.

Behavioral ports of the reference data layer (reference: utils/train_dataset.py,
utils/test_dataset.py, utils/dataset_utils.py:104-329) producing fixed-shape
numpy samples:

  * filenames/class pickles and per-identity caption text files are read in
    the reference's exact on-disk formats (data_dir/{split}/filenames.pickle,
    class_info.pickle, data_dir/text/<id>/<id>_<k>.txt)
  * caption token caches are pickle-compatible with the reference
    (captions_RNN.pickle layout; captions_<bert_type>.pickle is accepted in
    both the reference's torch-tensor layout and our numpy layout)
  * the BERT caption-index bug (reference: utils/train_dataset.py:77-82 —
    indexes the caption list with the raw random index instead of
    index*captions_per_image + sent_ix) is FIXED by default; set
    `compat_bert_caption_bug=True` to reproduce the reference behavior for
    parity runs
  * TestDataset resolves filename -> index with a dict (the reference does an
    O(N) list.index per item: utils/test_dataset.py:101-102)
  * `synthetic=True` generates deterministic per-key random images so every
    entry point runs end-to-end without the (unshipped) Face2Text images.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from text_guided_face_recognition_tpu.data.tokenizers import (
    LstmTokenizer,
    Vocabulary,
    build_dictionary,
    get_bert_tokenizer,
)
from text_guided_face_recognition_tpu.data.transforms import (
    decode_image,
    eval_transform,
    train_aug_u8,
    train_transform,
)

__all__ = ["load_filenames", "load_class_id", "load_captions",
           "load_text_data", "load_text_data_bert", "TrainDataset",
           "TestDataset"]


def load_filenames(data_dir: str, split: str) -> List[str]:
    """reference: utils/dataset_utils.py:306-316."""
    path = os.path.join(data_dir, split, "filenames.pickle")
    if not os.path.isfile(path):
        return []
    with open(path, "rb") as f:
        names = pickle.load(f)
    print(f"Load {split} filenames from: {path} ({len(names)})")
    return list(names)


def load_class_id(split_dir: str) -> List[int]:
    """reference: utils/dataset_utils.py:319-329."""
    path = os.path.join(split_dir, "class_info.pickle")
    with open(path, "rb") as f:
        class_id = pickle.load(f, encoding="bytes")
    print(f"Load class_info from: {path} ({len(class_id)})")
    return list(class_id)


def _read_caption_file(data_dir: str, filename: str) -> List[str]:
    cap_path = os.path.join(data_dir, "text", filename + ".txt")
    with open(cap_path, "r") as f:
        return [c for c in f.read().split("\n") if len(c) > 0]


def load_captions(data_dir: str, filenames: Sequence[str],
                  embeddings_num: int) -> List[List[str]]:
    """LSTM path: tokenize `embeddings_num` captions per image
    (reference: utils/dataset_utils.py:145-179)."""
    tok = LstmTokenizer()
    all_captions: List[List[str]] = []
    for name in filenames:
        cnt = 0
        for cap in _read_caption_file(data_dir, name):
            tokens = tok.tokenize(cap)
            if not tokens:
                continue
            all_captions.append(tokens)
            cnt += 1
            if cnt == embeddings_num:
                break
        if cnt < embeddings_num:
            print(f"ERROR: the captions for {name} less than {cnt}")
    return all_captions


def load_text_data(data_dir: str, embeddings_num: int):
    """LSTM caption cache, pickle-compatible with the reference's
    captions_RNN.pickle (reference: utils/dataset_utils.py:221-254).
    Returns (names..., captions..., vocab)."""
    filepath = os.path.join(data_dir, "captions_RNN.pickle")
    train_names = load_filenames(data_dir, "train")
    valid_names = load_filenames(data_dir, "valid")
    test_names = load_filenames(data_dir, "test")

    if not os.path.isfile(filepath):
        raw = [load_captions(data_dir, n, embeddings_num)
               for n in (train_names, valid_names, test_names)]
        (train_caps, valid_caps, test_caps), vocab = build_dictionary(*raw)
        with open(filepath, "wb") as f:
            pickle.dump([train_caps, valid_caps, test_caps,
                         vocab.ixtoword, vocab.wordtoix], f, protocol=2)
        print("\nSave to: ", filepath)
    else:
        with open(filepath, "rb") as f:
            x = pickle.load(f)
        train_caps, valid_caps, test_caps = x[0], x[1], x[2]
        vocab = Vocabulary(wordtoix=x[4], ixtoword=x[3])
    return (train_names, train_caps, valid_names, valid_caps,
            test_names, test_caps, vocab)


def _as_numpy_caption(x) -> np.ndarray:
    """Accept torch tensors (reference cache format) or arrays/lists."""
    if hasattr(x, "numpy"):
        return np.asarray(x.numpy(), np.int32)
    return np.asarray(x, np.int32)


def load_text_data_bert(data_dir: str, args):
    """BERT caption cache (reference: utils/dataset_utils.py:183-217);
    accepts the reference's torch-tensor pickles or our numpy pickles.

    The cache filename carries the tokenizer's cache_tag ("" for the HF
    path = the reference's exact captions_<bert_type>.pickle name;
    "-wordpiece"/"-hash" for the offline fallbacks), so switching
    tokenizers can never silently reuse another tokenizer's token ids."""
    names = {s: load_filenames(data_dir, s) for s in ("train", "valid", "test")}
    if not names["train"] and not names["test"]:
        raise FileNotFoundError(f"no split metadata under {data_dir}")
    # the reference's own cache name loads WITHOUT a tokenizer (it holds
    # already-tokenized ids — e.g. a cache shipped from an HF-online run)
    filepath = os.path.join(data_dir, f"captions_{args.bert_type}.pickle")
    if not os.path.isfile(filepath):
        encode = get_bert_tokenizer(args)
        tag = getattr(encode, "cache_tag", "")
        filepath = os.path.join(data_dir,
                                f"captions_{args.bert_type}{tag}.pickle")

    if not os.path.isfile(filepath):
        store = []
        for split in ("train", "valid", "test"):
            caps, masks = [], []
            for name in names[split]:
                cnt = 0
                for cap in _read_caption_file(data_dir, name):
                    ids, mask = encode(cap, args.bert_words_num)
                    caps.append(ids)
                    masks.append(mask)
                    cnt += 1
                    if cnt == args.captions_per_image:
                        break
                if cnt < args.captions_per_image:
                    print(f"ERROR: the captions for {name} less than {cnt}")
            store += [caps, masks]
        with open(filepath, "wb") as f:
            pickle.dump(store, f, protocol=2)
        print("\nSave to: ", filepath)
        tr_c, tr_m, va_c, va_m, te_c, te_m = store
    else:
        print("Loading ", filepath)
        with open(filepath, "rb") as f:
            x = pickle.load(f)
        tr_c, tr_m, va_c, va_m, te_c, te_m = (
            [_as_numpy_caption(c) for c in part] for part in x)
    return (names["train"], tr_c, tr_m, names["valid"], va_c, va_m,
            names["test"], te_c, te_m)


def _synthetic_image(key: str, img_size: int) -> np.ndarray:
    """Deterministic per-key uint8 image for data-free end-to-end runs."""
    seed = int.from_bytes(hashlib.sha1(key.encode()).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(img_size, img_size, 3), dtype=np.uint8)


class _DatasetBase:
    use_native: bool = True  # fused C++ decode+transform when available
    uint8_images: bool = False  # ship augmented uint8; device normalizes

    def _native_ok(self) -> bool:
        if not self.use_native or self.synthetic:
            return False
        from text_guided_face_recognition_tpu.data import native
        if self.uint8_images:
            return native.supports_u8()  # a v1 .so can't emit uint8
        return native.available()

    def _load_transformed(self, path: str, train: bool,
                          rng: np.random.Generator) -> Optional[np.ndarray]:
        """Fused native decode+resize+augment+normalize (native/tgfr_dataio.cpp);
        None -> caller falls back to the PIL path. The ctypes call releases
        the GIL, so the DataLoader thread pool parallelizes decodes."""
        if not self._native_ok():
            return None
        from text_guided_face_recognition_tpu.data import native
        seeds = np.asarray([rng.integers(0, 2**63)], np.uint64) if train \
            else None
        try:
            return native.decode_batch(
                [path], self.img_size, self.img_size, seeds=seeds,
                train_aug=train, bgr=self.model_type == "adaface",
                n_threads=1, u8_out=self.uint8_images)[0]
        except Exception:
            return None

    def _get_image(self, key: str, split: str) -> np.ndarray:
        if self.synthetic:
            return _synthetic_image(key, self.img_size)
        path = os.path.join(self.data_dir, "images", split, key + ".jpg")
        return decode_image(path, self.img_size)

    def pad_lstm_caption(self, caption: Sequence[int],
                         rng: np.random.Generator) -> Tuple[np.ndarray, int]:
        """Pad with 0 ('<end>') or randomly subsample to word_num
        (reference: utils/train_dataset.py:42-63)."""
        cap = np.asarray(caption, np.int64)
        if (cap == 0).sum() > 0:
            print("ERROR: do not need END (0) token", cap)
        x = np.zeros((self.word_num,), np.int32)
        n = len(cap)
        if n <= self.word_num:
            x[:n] = cap
            return x, n
        ix = np.sort(rng.permutation(n)[: self.word_num])
        x[:] = cap[ix]
        return x, self.word_num


class TrainDataset(_DatasetBase):
    """reference: utils/train_dataset.py:11-90. Samples are dicts of numpy
    arrays; the image is NHWC float32 in [-1, 1]."""

    def __init__(self, filenames, captions, att_masks=None,
                 vocab: Optional[Vocabulary] = None, transform=None,
                 split: str = "train", args=None, synthetic: bool = False,
                 seed: int = 0):
        self.filenames = list(filenames)
        self.captions = captions
        self.att_masks = att_masks
        self.vocab = vocab
        self.transform = transform
        self.split = split
        self.args = args
        self.synthetic = synthetic or bool(getattr(args, "synthetic", False))
        self.embeddings_num = args.captions_per_image
        self.data_dir = args.data_dir
        self.en_type = args.en_type
        self.model_type = args.model_type
        self.img_size = args.img_size
        self.uint8_images = bool(getattr(args, "uint8_images", False))
        self.word_num = (args.bert_words_num if args.en_type == "BERT"
                         else args.lstm_words_num)
        self.compat_bug = bool(getattr(args, "compat_bert_caption_bug", False))
        # synthetic mode still prefers real identity metadata when present
        # (real-captions runs: images unshipped, class pickles shipped)
        try:
            self.class_id = load_class_id(os.path.join(self.data_dir, split))
        except (FileNotFoundError, OSError):
            if not self.synthetic:
                raise
            self.class_id = self._synthetic_class_ids(args)
        # counter-based per-sample RNG: the DataLoader thread pool calls
        # __getitem__ concurrently, so a shared RNG stream would make caption
        # choice and augmentation depend on the thread schedule. Each call
        # derives its generator from (seed, index, visit#) instead —
        # deterministic for a given seed, fresh every epoch.
        self.seed = seed
        self._visits: Dict[int, int] = {}
        # frozen-backbone feature cache (engine/feature_cache.py): when set,
        # __getitem__ returns precomputed (gl, lc) instead of the image
        self._feature_cache: Optional[Dict[str, np.ndarray]] = None
        # serving knobs (src/extract_embeddings.py): disable train-time
        # augmentation / pin the caption index for deterministic embeddings
        self.augment: bool = True
        self.fixed_sent_ix: Optional[int] = None

    def _synthetic_class_ids(self, args) -> List[int]:
        n = len(self.filenames)
        return [i % args.num_classes for i in range(n)]

    def check_classifier_coverage(self, num_classes: int) -> None:
        """Fail loudly when the identity count outgrows the classifier: a
        label >= num_classes makes the dense margin-CE NaN silently
        (take_along_axis fill mode) and the partial-FC head silently drop
        the target logit — both unrecoverable misconfigurations. Called by
        the TRAINERS (stage1/stage2), where a classifier actually exists —
        eval/serving consumers (engine/extract.py) build train-split
        datasets with no margin head and must not be blocked by it."""
        nc = int(num_classes or 0)
        if nc and self.class_id and max(self.class_id) >= nc:
            raise ValueError(
                f"dataset '{self.split}' class ids reach "
                f"{max(self.class_id)} but num_classes is {nc}; raise "
                "num_classes to cover the dataset's identity count (a label "
                ">= num_classes silently NaNs the dense margin CE and "
                "silently drops the target logit under partial-FC)")

    def __len__(self) -> int:
        return len(self.filenames)

    def _produce_image(self, index: int,
                       rng: np.random.Generator) -> np.ndarray:
        key = self.filenames[index]
        img = None
        if self.transform is None and not self.synthetic:
            path = os.path.join(self.data_dir, "images", self.split,
                                key + ".jpg")
            img = self._load_transformed(path, train=self.augment, rng=rng)
        if img is None:
            raw = self._get_image(key, self.split)
            if self.transform is not None:
                img = self.transform(raw)
            elif not self.augment:
                img = (np.ascontiguousarray(raw) if self.uint8_images
                       else eval_transform(raw, self.model_type))
            elif self.uint8_images:
                img = train_aug_u8(raw, rng)
            else:
                img = train_transform(raw, rng, self.model_type)
        return img

    def _consume_aug_draws(self, rng: np.random.Generator) -> None:
        """Advance `rng` exactly as _produce_image would, without producing
        the image, so the caption draws that follow stay identical in
        feature-cache mode. (The one divergence: a corrupt file on the
        native path consumes 1 seed draw before falling back to PIL's 2 —
        feature-cache mode assumes decodable images.)"""
        if self.transform is not None or not self.augment:
            return  # custom transforms / eval path take no rng
        if not self.synthetic and self._native_ok():
            rng.integers(0, 2 ** 63)  # _load_transformed's per-image seed
        else:
            rng.random()              # train_transform: RandomGrayscale
            rng.random()              # train_transform: RandomHorizontalFlip

    def peek_augmented_image(self, index: int) -> np.ndarray:
        """The image __getitem__ would produce at this index's NEXT visit,
        WITHOUT advancing the visit counter (feature-cache precompute:
        engine/feature_cache.py refreshes before each epoch's loader pass)."""
        visit = self._visits.get(index, -1) + 1
        rng = np.random.default_rng((self.seed, index, visit))
        return self._produce_image(index, rng)

    def set_feature_cache(self,
                          cache: Optional[Dict[str, np.ndarray]]) -> None:
        """cache: {"gl": (N, ...), "lc": (N, ...)} frozen-backbone outputs
        aligned with dataset indices (None disables)."""
        self._feature_cache = cache

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        key = self.filenames[index]
        cls_id = self.class_id[index]
        visit = self._visits[index] = self._visits.get(index, -1) + 1
        rng = np.random.default_rng((self.seed, index, visit))
        if self._feature_cache is not None:
            self._consume_aug_draws(rng)
            sample = {"img_gl": self._feature_cache["gl"][index],
                      "img_lc": self._feature_cache["lc"][index]}
        else:
            sample = {"img": self._produce_image(index, rng)}

        sent_ix = (self.fixed_sent_ix if self.fixed_sent_ix is not None
                   else int(rng.integers(0, self.embeddings_num)))
        new_sent_ix = index * self.embeddings_num + sent_ix

        if self.en_type == "BERT":
            # reference bug: uses sent_ix instead of new_sent_ix (:77-82)
            cap_index = sent_ix if self.compat_bug else new_sent_ix
            sample.update(
                caps=_as_numpy_caption(self.captions[cap_index]),
                mask=_as_numpy_caption(self.att_masks[cap_index]),
                key=key, cls_id=np.int32(cls_id))
            return sample
        caps, cap_len = self.pad_lstm_caption(self.captions[new_sent_ix],
                                              rng)
        sample.update(caps=caps, cap_len=np.int32(cap_len),
                      key=key, cls_id=np.int32(cls_id))
        return sample


class TestDataset(_DatasetBase):
    """Pair-list verification dataset (reference: utils/test_dataset.py:12-127).
    Pairs come from `img1 img2 label` lines; caption index is the pair file
    key's first caption (sent_ix = 0)."""

    __test__ = False  # not a pytest class despite the name

    def __init__(self, filenames, captions, att_masks=None,
                 vocab: Optional[Vocabulary] = None, transform=None,
                 split: str = "test", args=None, synthetic: bool = False):
        self.filenames = list(filenames)
        self.captions = captions
        self.att_masks = att_masks
        self.vocab = vocab
        self.transform = transform
        self.split = split
        self.args = args
        self.synthetic = synthetic or bool(getattr(args, "synthetic", False))
        self.embeddings_num = args.captions_per_image
        self.data_dir = args.data_dir
        self.en_type = args.en_type
        self.model_type = args.model_type
        self.img_size = args.img_size
        self.uint8_images = bool(getattr(args, "uint8_images", False))
        self.word_num = (args.bert_words_num if args.en_type == "BERT"
                         else args.lstm_words_num)
        self.n_words = vocab.n_words if vocab is not None else 0
        # O(1) filename lookup (the reference scans the list per item)
        self._index = {name: i for i, name in enumerate(self.filenames)}
        pair_file = (args.test_pair_list if split == "test"
                     else args.valid_pair_list)
        # Real pair-list files win even in synthetic-image mode (protocol-
        # scale runs use a real list over synthetic images); consumers that
        # infer group widths (identification test_sub) must know which case
        # they got — see engine/prepare.prepare_dataloader.
        self.synthetic_pairs = self.synthetic and not os.path.isfile(pair_file)
        self.imgs_pair, self.pair_label = self._read_pairs(pair_file)
        self.rng = np.random.default_rng(0)

    def _read_pairs(self, path: str):
        if self.synthetic and not os.path.isfile(path):
            return self._synthetic_pairs()
        pairs, labels = [], []
        with open(path) as fd:
            for line in fd:
                parts = line.split(" ")
                if len(parts) < 3:
                    continue
                pairs.append([parts[0], parts[1]])
                labels.append(int(parts[2]))
        return pairs, labels

    def _synthetic_pairs(self):
        """Identification-protocol synthetic pairs: per subject 1 genuine at
        column = subject index in its group + imposters."""
        n = min(len(self.filenames), 64)
        pairs, labels = [], []
        for i in range(n):
            for j in range(4):
                a = self.filenames[i] + ".jpg"
                b = self.filenames[(i + j) % n] + ".jpg"
                pairs.append([a, b])
                labels.append(1 if j == 0 else 0)
        return pairs, labels

    def __len__(self) -> int:
        return len(self.imgs_pair)

    def pair_sides(self, index: int):
        """[(img_name, key), (img_name, key)] for pair `index` — the name
        resolves the image file, the key resolves captions/features.

        Pair-list entries are bare `<id>_<k>.jpg` names; the reference's
        images live under a per-identity dir `<id>/<id>_<k>.jpg`
        (utils/test_dataset.py:95-102). Resolution prefers whatever stem the
        filename index actually contains, so real pair lists work both
        against the on-disk layout AND in synthetic mode (protocol-scale
        runs: real pair list + generated images)."""
        out = []
        for n in self.imgs_pair[index]:
            if n[:-4] not in self._index:
                joined = os.path.join(n.split("_")[0], n)
                if joined[:-4] in self._index or not self.synthetic:
                    # reference on-disk layout (also the non-synthetic
                    # default for unresolvable entries)
                    n = joined
            out.append((n, n[:-4]))
        return out

    def _load_side(self, name: str, key: str, rng: np.random.Generator,
                   need_caption: bool = True) -> Dict[str, np.ndarray]:
        """One side's sample: image (eval transform) + first caption
        (sent_ix = 0, reference: utils/test_dataset.py:107-112). `rng` is
        only consumed by the LSTM pad/subsample of over-long captions.
        `need_caption=False` skips caption/mask loading for image-only
        consumers (org_face_test's table mode embeds raw backbone feats)."""
        img = None
        path = os.path.join(self.data_dir, "images", self.split, name)
        if self.transform is None and not self.synthetic:
            img = self._load_transformed(path, train=False, rng=rng)
        if img is None:
            if self.synthetic:
                raw = _synthetic_image(key, self.img_size)
            else:
                raw = decode_image(path, self.img_size)
            if self.transform is not None:
                img = self.transform(raw)
            elif self.uint8_images:
                img = np.ascontiguousarray(raw)  # device normalizes
            else:
                img = eval_transform(raw, self.model_type)
        side: Dict[str, np.ndarray] = {"img": img}
        if not need_caption:
            return side
        real_index = self._index.get(key, 0)
        new_sent_ix = real_index * self.embeddings_num  # sent_ix = 0
        if self.en_type == "BERT":
            side["cap"] = _as_numpy_caption(self.captions[new_sent_ix])
            side["mask"] = _as_numpy_caption(self.att_masks[new_sent_ix])
        else:
            caps, cap_len = self.pad_lstm_caption(
                self.captions[new_sent_ix], rng)
            side["cap"] = caps
            side["cap_len"] = np.int32(cap_len)
        return side

    def get_sample(self, name: str, key: str,
                   need_caption: bool = True) -> Dict[str, np.ndarray]:
        """Canonical (pair-independent) sample for table-mode eval: the rng
        is seeded per SAMPLE, so an image appearing in many pairs always
        gets the same caption crop (the pair path's per-pair rng only
        matters for LSTM captions longer than lstm_words_num)."""
        rng = np.random.default_rng((1, self._index.get(key, 0)))
        return self._load_side(name, key, rng, need_caption=need_caption)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((0, index))
        sample: Dict[str, np.ndarray] = {
            "pair_label": np.int32(self.pair_label[index])}
        for slot, (name, key) in enumerate(self.pair_sides(index), start=1):
            side = self._load_side(name, key, rng)
            sample[f"img{slot}"] = side["img"]
            sample[f"cap{slot}"] = side["cap"]
            if self.en_type == "BERT":
                sample[f"mask{slot}"] = side["mask"]
            else:
                sample[f"cap_len{slot}"] = side["cap_len"]
        return sample
