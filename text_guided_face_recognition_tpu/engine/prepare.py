"""Model-factory / weight-loading layer (the reference's L3 "prepare" layer,
reference: utils/prepare.py).

Every factory returns a `Bundle(module, variables)`; frozen backbones are
loaded eval-mode (BatchNorm running stats) and never receive gradients
(reference freezes + evals them: utils/prepare.py:51-99). Pretrained torch
checkpoints are converted on the fly (engine/convert.py); Orbax checkpoints
load natively; with neither present the factory random-initializes and warns —
every entry point stays runnable end-to-end (synthetic mode).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from text_guided_face_recognition_tpu import models as M
from text_guided_face_recognition_tpu.data import (
    DataLoader,
    TestDataset,
    TrainDataset,
    load_text_data,
    load_text_data_bert,
)
from text_guided_face_recognition_tpu.engine import checkpoint as ckpt
from text_guided_face_recognition_tpu.engine import convert as C

__all__ = ["Bundle", "prepare_arcface", "prepare_adaface", "prepare_magface",
           "prepare_backbone", "prepare_text_encoder", "prepare_image_head",
           "prepare_fusion_net", "prepare_dataloader", "compute_dtype"]


@dataclasses.dataclass
class Bundle:
    module: nn.Module
    variables: Dict[str, Any]

    @property
    def params(self):
        return self.variables.get("params")


def compute_dtype(args) -> Any:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[getattr(args, "compute_dtype", "float32")]


def _rng() -> jax.Array:
    return jax.random.PRNGKey(0)


def _dummy_image(args) -> jnp.ndarray:
    return jnp.zeros((1, args.img_size, args.img_size, args.ch_size),
                     jnp.float32)


def _maybe_convert(path: str, converter, like: Dict[str, Any],
                   what: str) -> Optional[Dict[str, Any]]:
    """Load `path` as torch-.pth (convert) or as an Orbax dir; None if absent."""
    if path and os.path.isfile(path):
        tree = converter(path)
        print(f"loading pretrained {what} from {path}")
        return tree
    if path and ckpt.checkpoint_exists(path):
        print(f"loading {what} checkpoint from {path}")
        return ckpt.load_checkpoint(path, like=like)
    warnings.warn(f"{what}: no weights at {path!r}; using random init "
                  "(synthetic/e2e mode)")
    return None


def _load_torch_obj(path: str):
    """torch.load + an npify helper for the reference's dict-of-state-dict
    checkpoint bundles (src/train_encoders_bert.py:59-80, src/fusion_bert.py:
    166-191)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)

    def npify(d):
        if hasattr(d, "state_dict"):
            d = d.state_dict()
        return {k: np.asarray(v.detach().cpu().numpy())
                if hasattr(v, "detach") else np.asarray(v)
                for k, v in d.items()}

    return obj, npify


def _merge(variables: Dict[str, Any], loaded: Optional[Dict[str, Any]]
           ) -> Dict[str, Any]:
    if loaded is None:
        return variables
    out = dict(variables)
    for coll, tree in loaded.items():
        if coll in out:
            out[coll] = jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b, a.dtype), out[coll], tree,
                is_leaf=lambda x: not isinstance(x, dict))
        else:
            out[coll] = jax.tree_util.tree_map(jnp.asarray, tree)
    return out


# --------------------------------------------------------------- backbones --

def prepare_arcface(args) -> Bundle:
    """Frozen ArcFace iresnet18 (reference: utils/prepare.py:51-63)."""
    net = M.iresnet18(dtype=compute_dtype(args))
    variables = net.init(_rng(), _dummy_image(args))
    loaded = _maybe_convert(
        args.weights_arcface,
        lambda p: C.convert_iresnet(C.load_torch_state_dict(p)),
        variables, "arcface backbone")
    return Bundle(net, _merge(variables, loaded))


def prepare_adaface(args) -> Bundle:
    """Frozen AdaFace ir_18 (reference: utils/prepare.py:67-82 — strips the
    'model.' key prefix from the lightning ckpt)."""
    net = M.build_model("ir_18", dtype=compute_dtype(args))
    variables = net.init(_rng(), _dummy_image(args))

    def conv(p):
        sd = C.load_torch_state_dict(p, key="state_dict")
        sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
        return C.convert_irbackbone(sd)

    loaded = _maybe_convert(args.weights_adaface, conv, variables,
                            "adaface backbone")
    return Bundle(net, _merge(variables, loaded))


def prepare_magface(args) -> Bundle:
    """Frozen MagFace iresnet18 (reference: utils/prepare.py:86-99 — deletes
    module.fc.weight before load)."""
    from text_guided_face_recognition_tpu.models.magface import network_builder
    net = network_builder("iresnet18", dtype=compute_dtype(args))
    variables = net.init(_rng(), _dummy_image(args))

    def conv(p):
        sd = C.load_torch_state_dict(p, key="state_dict")
        sd.pop("module.fc.weight", None)
        return C.convert_magface(sd)

    loaded = _maybe_convert(args.weights_magface, conv, variables,
                            "magface backbone")
    return Bundle(net, _merge(variables, loaded))


def prepare_backbone(args) -> Bundle:
    return {"arcface": prepare_arcface, "adaface": prepare_adaface,
            "magface": prepare_magface}[args.model_type](args)


# ------------------------------------------------------------ text + heads --

def prepare_text_encoder(args, load: bool = True
                         ) -> Tuple[Bundle, Optional[Bundle]]:
    """Text encoder (+head for BERT) with optional checkpoint restore
    (reference: utils/prepare.py:14-36)."""
    dtype = compute_dtype(args)
    if args.en_type == "BERT":
        enc = M.TextEncoder(
            bert_type=args.bert_type, dtype=dtype,
            fused_ln=bool(getattr(args, "fused_ln", False)),
            fused_dropout=bool(getattr(args, "fused_dropout", False)),
            fused_block=str(getattr(args, "fused_block", "none")))
        ids = jnp.zeros((1, args.bert_words_num), jnp.int32)
        mask = jnp.ones((1, args.bert_words_num), jnp.int32)
        enc_vars = enc.init(_rng(), ids, mask)
        head = M.TextHeading(feat_dim=args.aux_feat_dim_per_granularity,
                             dtype=dtype)
        words = enc.apply(enc_vars, ids, mask)[0]
        head_vars = head.init(_rng(), words)
        path = args.text_encoder_path
        if load and path:
            if os.path.isfile(path):  # torch weights
                obj, npify = _load_torch_obj(path)
                if isinstance(obj, dict) and "model" in obj and "head" in obj:
                    # reference text bundle {'model','head'}
                    # (src/train_encoders_bert.py:74-79)
                    enc_vars = _merge(enc_vars, C.convert_text_encoder_bundle(
                        npify(obj["model"]), args.bert_type))
                    head_vars = _merge(head_vars, C.convert_text_heading(
                        npify(obj["head"])))
                    print("converted reference text encoder+head:", path)
                else:  # raw HF torch text model
                    enc_vars = _merge(enc_vars, {"params": {
                        "model": C.convert_hf_text_model(
                            npify(obj), args.bert_type)["params"]}})
                    print("converted HF torch text encoder:", path)
            elif ckpt.checkpoint_exists(path):
                tree = ckpt.load_checkpoint(
                    path, like={"model": enc_vars, "head": head_vars},
                    partial=True)
                enc_vars, head_vars = tree["model"], tree["head"]
                print("loading text encoder weights:", path)
            else:
                warnings.warn(f"text encoder: no weights at {path!r}; "
                              "random init")
        return Bundle(enc, enc_vars), Bundle(head, head_vars)

    # LSTM / GRU
    enc = M.RNNEncoder(vocab_size=max(int(args.vocab_size), 2),
                       en_type=args.en_type, nhidden=args.embedding_dim,
                       unroll=max(1, int(getattr(args, "rnn_unroll", 1) or 1)),
                       dtype=dtype)
    caps = jnp.zeros((1, args.lstm_words_num), jnp.int32)
    lens = jnp.ones((1,), jnp.int32)
    enc_vars = enc.init(_rng(), caps, lens)
    path = args.text_encoder_path
    if load and path and os.path.isfile(path):
        # reference LSTM text ckpt {'model': RNNEncoder sd}
        # (utils/prepare.py:27-33)
        obj, npify = _load_torch_obj(path)
        sd = npify(obj["model"]) if isinstance(obj, dict) and "model" in obj \
            else npify(obj)
        enc_vars = _merge(enc_vars, C.convert_rnn_encoder(sd, args.en_type))
        print("converted reference RNN text encoder:", path)
    elif load and path and ckpt.checkpoint_exists(path):
        tree = ckpt.load_checkpoint(args.text_encoder_path,
                                    like={"model": enc_vars}, partial=True)
        enc_vars = tree["model"]
        print("loading text encoder weights:", args.text_encoder_path)
    return Bundle(enc, enc_vars), None


def prepare_image_head(args, load: bool = True) -> Bundle:
    """reference: utils/prepare.py:39-46."""
    head = M.ImageHeading(feat_dim=args.aux_feat_dim_per_granularity,
                          dtype=compute_dtype(args))
    g = jnp.zeros((1, 512), jnp.float32)
    l = jnp.zeros((1, 14, 14, 256), jnp.float32)
    variables = head.init(_rng(), g, l)
    if load and args.image_encoder_path and \
            os.path.isfile(args.image_encoder_path):
        # reference image ckpt {'image_head': sd}
        # (src/train_encoders_bert.py:59-72)
        sd = C.load_torch_state_dict(args.image_encoder_path,
                                     key="image_head")
        variables = _merge(variables, C.convert_image_heading(sd))
        print("converted reference image head:", args.image_encoder_path)
    elif load and args.image_encoder_path and \
            ckpt.checkpoint_exists(args.image_encoder_path):
        tree = ckpt.load_checkpoint(args.image_encoder_path,
                                    like={"image_head": variables},
                                    partial=True)
        variables = tree["image_head"]
        print("loading image encoder:", args.image_encoder_path)
    elif load and args.image_encoder_path:
        warnings.warn(f"image head: no checkpoint at "
                      f"{args.image_encoder_path!r}; random init")
    return Bundle(head, variables)


def prepare_fusion_net(args, load: bool = True) -> Optional[Bundle]:
    """reference: utils/prepare.py:103-119."""
    dtype = compute_dtype(args)
    feat = args.aux_feat_dim_per_granularity
    if args.fusion_type == "concat":
        return None
    if args.fusion_type == "linear":
        net = M.LinearFusion(fusion_final_dim=args.fusion_final_dim,
                             dtype=dtype)
        variables = net.init(_rng(), jnp.zeros((1, 256)), jnp.zeros((1, feat)))
    elif args.fusion_type == "fcfm":
        if args.en_type == "LSTM":
            net = M.WordLevelCFA_LSTM(channel_dim=256, dtype=dtype)
            variables = net.init(_rng(), jnp.zeros((1, 14, 14, 256)),
                                 jnp.zeros((1, 256, args.lstm_words_num)))
        else:
            net = M.FCFM(channel_dim=36, dtype=dtype)
            variables = net.init(
                _rng(), jnp.zeros((1, 14, 14, 256)),
                jnp.zeros((1, feat, args.bert_words_num - 2)),
                jnp.zeros((1, feat)), jnp.zeros((1, feat)))
    else:
        raise ValueError(f"unknown fusion_type {args.fusion_type!r}")
    if load and args.fusion_net_path and \
            os.path.isfile(args.fusion_net_path):
        # reference fusion ckpt {'net': sd} (utils/utils.py:84-88)
        sd = C.load_torch_state_dict(args.fusion_net_path, key="net")
        if args.fusion_type == "linear":
            conv = C.convert_linear_fusion(sd)
        elif args.en_type == "LSTM":
            conv = C.convert_wordlevel_cfa(sd)
        else:
            conv = C.convert_fcfm(sd)
        variables = _merge(variables, conv)
        print("converted reference fusion net:", args.fusion_net_path)
    elif load and args.fusion_net_path and \
            ckpt.checkpoint_exists(args.fusion_net_path):
        tree = ckpt.load_checkpoint(args.fusion_net_path,
                                    like={"net": variables}, partial=True)
        variables = tree["net"]
        print("loading fusion checkpoint:", args.fusion_net_path)
    return Bundle(net, variables)


# --------------------------------------------------------------- dataloader --

def prepare_dataloader(args, split: str, transform=None):
    """reference: utils/prepare.py:171-242. Falls back to synthetic data when
    the Face2Text assets are absent (images are not shipped; SURVEY.md §2.11)."""
    synthetic = bool(getattr(args, "synthetic", False))
    if args.en_type == "BERT":
        try:
            (tr_n, tr_c, tr_m, va_n, va_c, va_m,
             te_n, te_c, te_m) = load_text_data_bert(args.data_dir, args)
        except (FileNotFoundError, OSError):
            warnings.warn("caption assets missing; generating synthetic "
                          "caption/token data")
            synthetic = True
            tr_n, tr_c, tr_m = _synthetic_bert(args, 64)
            va_n, va_c, va_m = _synthetic_bert(args, 32)
            te_n, te_c, te_m = _synthetic_bert(args, 32)
        data = {"train": (tr_n, tr_c, tr_m), "valid": (va_n, va_c, va_m),
                "test": (te_n, te_c, te_m)}
        names, caps, masks = data[split]
        if split == "train":
            ds = TrainDataset(names, caps, masks, args=args,
                              split="train", synthetic=synthetic,
                              seed=args.manual_seed)
        else:
            ds = TestDataset(names, caps, masks, args=args, split=split,
                             synthetic=synthetic)
    else:
        try:
            (tr_n, tr_c, va_n, va_c, te_n, te_c, vocab) = \
                load_text_data(args.data_dir, args.captions_per_image)
        except (FileNotFoundError, OSError):
            warnings.warn("caption assets missing; generating synthetic "
                          "caption/token data")
            synthetic = True
            vocab = _synthetic_vocab(200)
            tr_n, tr_c = _synthetic_lstm(args, 64, vocab)
            va_n, va_c = _synthetic_lstm(args, 32, vocab)
            te_n, te_c = _synthetic_lstm(args, 32, vocab)
        args.vocab_size = vocab.n_words
        data = {"train": (tr_n, tr_c), "valid": (va_n, va_c),
                "test": (te_n, te_c)}
        names, caps = data[split]
        if split == "train":
            ds = TrainDataset(names, caps, vocab=vocab, args=args,
                              split="train", synthetic=synthetic,
                              seed=args.manual_seed)
        else:
            ds = TestDataset(names, caps, vocab=vocab, args=args, split=split,
                             synthetic=synthetic)

    if (split in ("test", "valid") and args.is_ident
            and getattr(ds, "synthetic_pairs", synthetic)):
        # synthetic pair groups: genuine pair at column 0 of each 4-pair
        # group. Only when the pairs THEMSELVES are synthetic — a real
        # pair list under synthetic images (protocol-scale runs) keeps the
        # caller's test_sub (it was clobbered to len//4 before r5, turning
        # the 300-wide identification groups into garbage 4-wide ones)
        args.test_sub = len(ds) // 4

    if split == "train":
        # Multi-host pods: each process loads only its slice of every global
        # batch (same seeded permutation on all hosts -> identical global
        # batch composition to a single-host run; see data/loader.py).
        import jax
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        dl = DataLoader(ds, batch_size=args.batch_size, drop_last=True,
                        shuffle=True, num_workers=args.num_workers,
                        seed=args.manual_seed, process_shard=shard)
    else:
        dl = DataLoader(ds, batch_size=args.batch_size, drop_last=False,
                        shuffle=False, num_workers=args.num_workers)
    return dl, ds


def _synthetic_vocab(n: int):
    from text_guided_face_recognition_tpu.data.tokenizers import Vocabulary
    v = Vocabulary()
    for i in range(n):
        v.add(f"w{i}")
    return v


def _synthetic_lstm(args, n_images: int, vocab):
    rng = np.random.default_rng(0)
    names = [f"s{i}_0" for i in range(n_images)]
    caps = [rng.integers(1, vocab.n_words,
                         size=rng.integers(3, args.lstm_words_num + 4)).tolist()
            for _ in range(n_images * args.captions_per_image)]
    return names, caps


def _synthetic_bert(args, n_images: int):
    rng = np.random.default_rng(0)
    names = [f"s{i}_0" for i in range(n_images)]
    caps, masks = [], []
    for _ in range(n_images * args.captions_per_image):
        n_tok = int(rng.integers(4, args.bert_words_num))
        ids = np.zeros(args.bert_words_num, np.int32)
        ids[0] = 101
        ids[1:n_tok - 1] = rng.integers(1000, 30000, n_tok - 2)
        ids[n_tok - 1] = 102
        m = np.zeros(args.bert_words_num, np.int32)
        m[:n_tok] = 1
        caps.append(ids)
        masks.append(m)
    return names, caps, masks
