"""Typed configuration system.

Mirrors the reference's YAML-driven flag surface (reference: cfg/*.yml merged by
utils/utils.py:32-44 into one EasyDict) but with *validated, typed* fields.
Every field name used by the reference configs (cfg/train_bert.yml,
cfg/train_lstm.yml, cfg/fusion_bert.yml, cfg/fusion_lstm.yml, cfg/test.yml) is
preserved so existing YAML files load unchanged.

Unlike the reference (which performs no validation — cfg/train_bert.yml:35
contains `min_lr_bert: 0.00002)`, a string that would crash the Adam
constructor at runtime), values are coerced to their declared types at load
time with a clear warning, and type errors fail fast with the offending key.
"""

from __future__ import annotations

import dataclasses
import re
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

__all__ = ["TrainSmooth", "TrainCfg", "TGFRConfig", "load_yaml", "merge_args_yaml"]

_NUM_PREFIX = re.compile(r"^\s*([+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)")


def _coerce(name: str, value: Any, typ: type) -> Any:
    """Coerce ``value`` to ``typ``, tolerating the reference's YAML typos."""
    if value is None:
        return None
    if typ is float:
        if isinstance(value, (int, float)):
            return float(value)
        if isinstance(value, str):
            m = _NUM_PREFIX.match(value)
            if m:
                warnings.warn(
                    f"config field {name!r}: coerced malformed value {value!r} "
                    f"to float {m.group(1)} (reference-compat leniency)"
                )
                return float(m.group(1))
        raise TypeError(f"config field {name!r}: cannot coerce {value!r} to float")
    if typ is int:
        if isinstance(value, bool):
            raise TypeError(f"config field {name!r}: got bool, expected int")
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value == int(value):
            return int(value)
        if isinstance(value, str) and value.strip().lstrip("+-").isdigit():
            return int(value.strip())
        raise TypeError(f"config field {name!r}: cannot coerce {value!r} to int")
    if typ is bool:
        if isinstance(value, bool):
            return value
        if isinstance(value, str) and value.lower() in ("true", "false"):
            return value.lower() == "true"
        raise TypeError(f"config field {name!r}: cannot coerce {value!r} to bool")
    if typ is str:
        return str(value)
    return value


@dataclass
class TrainSmooth:
    """DAMSM smoothing temperatures (reference: cfg/train_bert.yml:52-57)."""

    GAMMA1: float = 4.0
    GAMMA2: float = 5.0
    GAMMA3: float = 10.0


@dataclass
class TrainCfg:
    FLAG: bool = True
    SMOOTH: TrainSmooth = field(default_factory=TrainSmooth)


@dataclass
class TGFRConfig:
    """The full flag surface, one namespace (reference passes one `args` blob).

    Field groups follow SURVEY.md §2.10; defaults follow cfg/train_bert.yml.
    """

    # --- paths / artifacts (cfg/train_bert.yml:2-11) ---
    CONFIG_NAME: str = "Train"
    dataset_name: str = "face2text"
    data_dir: str = "./data/face2text"
    checkpoints_path: str = "./checkpoints"
    weights_adaface: str = "./weights/pretrained/adaface_ir18_webface4m.ckpt"
    weights_arcface: str = "./weights/pretrained/arcface_ir18_ms1mv3.pth"
    weights_magface: str = "./weights/pretrained/magface_iresnet18_casia_dp.pth"
    valid_pair_list: str = "./data/face2text/images/valid_199_sub.txt"
    test_pair_list: str = "./data/face2text/images/test_199_sub.txt"
    text_encoder_path: str = ""
    image_encoder_path: str = ""
    fusion_net_path: str = ""
    resume_epoch: int = 1
    resume_model_path: str = ""

    # --- machine (cfg/train_bert.yml:14-17) ---
    num_workers: int = 8
    gpu_id: List[int] = field(default_factory=lambda: [0])  # kept for YAML compat; unused on TPU
    manual_seed: int = 100
    CUDA: bool = True      # YAML compat; ignored (device placement is JAX's)
    cuda: bool = True      # fusion/test cfgs use lowercase
    num_devices: int = 0   # TPU-native: 0 = use all visible devices

    # --- loss flags & weights (cfg/train_bert.yml:20-26) ---
    is_DAMSM: bool = True
    is_CLIP: bool = True
    is_CMP: bool = False
    is_WRA: bool = False
    is_ident_loss: bool = True
    lambda_clip: float = 2.0
    lambda_id: float = 100.0

    # --- model arch (cfg/train_bert.yml:29-34) ---
    aux_feat_dim_per_granularity: int = 256
    img_size: int = 112
    model_type: str = "arcface"  # arcface | adaface | magface
    ch_size: int = 3
    num_classes: int = 4500
    backbone: str = "resnet18"
    classify: str = "softmax"
    metric: str = "arc_margin"
    easy_margin: bool = False
    loss: str = "focal_loss"
    optimizer: str = "sgd"
    use_se: bool = False

    # --- optimizer / LR (cfg/train_bert.yml:36-40, train_lstm.yml:33-39) ---
    init_lr_bert: float = 7e-5
    min_lr_bert: float = 2e-5
    init_lr_lstm: float = 1e-3
    min_lr_lstm: float = 9e-5
    r_step: int = 100
    lr_head: float = 1e-3
    weight_decay: float = 0.01
    clip_max_norm: float = 1.0             # norm used when apply_grad_clip is on (reference YAML field)
    apply_grad_clip: bool = False          # False = reference BEHAVIOR (its clip_grad_norm_ runs after optimizer.step() - a no-op, DEVIATIONS #3) and saves the ~1.25 ms/step whole-tree norm pass; True = the reference comment's INTENT (pre-step text-encoder clip)
    lr_image_train: float = 0.1
    lr_step: int = 5
    gamma: float = 0.8

    # --- schedule (cfg/train_bert.yml:42-47) ---
    batch_size: int = 32
    max_epoch: int = 20
    test_interval: int = 2
    save_interval: int = 1
    temperature: float = 2.0
    trainable: bool = False

    # --- flags ---
    do_test: bool = False

    # --- DAMSM smoothing ---
    TRAIN: TrainCfg = field(default_factory=TrainCfg)

    # --- encoder selection (cfg/train_bert.yml:59-67) ---
    en_type: str = "BERT"  # BERT | LSTM | GRU
    bert_words_num: int = 24
    lstm_words_num: int = 18
    embedding_dim: int = 256
    captions_per_image: int = 4
    vocab_size: int = 0  # LSTM path: filled from the dataset vocab
    bert_type: str = "bert"
    bert_config: str = "bert-base-uncased"
    align_config: str = "kakaobrain/align-base"
    clip_config: str = "openai/clip-vit-base-patch32"
    blip_config: str = "Salesforce/blip-image-captioning-base"
    falva_config: str = "facebook/flava-full"  # (sic) reference keeps the typo
    groupvit_config: str = "nvidia/groupvit-gcc-yfcc"

    # --- fusion arch (cfg/test.yml:57-60) ---
    fusion_type: str = "fcfm"  # fcfm | linear | concat
    fusion_final_dim: int = 640

    # --- eval / dumps (cfg/test.yml:62-65) ---
    roc_file: str = "roc"
    is_roc: bool = False
    is_ident: bool = False
    test_sub: int = 1193
    split: str = "test"

    # --- runtime extras (populated by entry points, not YAML) ---
    current_epoch: int = 0
    len_train_dl: int = 0
    cfg_file: Optional[str] = None

    # TPU-native additions (deviations documented in docs/DEVIATIONS.md)
    compat_bert_caption_bug: bool = False  # reproduce utils/train_dataset.py:77-82 mispairing
    compat_frozen_text: bool = False       # reproduce the reference's no-grad text path
    synthetic: bool = False                # run on generated images/captions
    max_steps: int = 0                     # >0: cap steps per epoch (smoke runs)
    keep_last_ckpts: int = 0               # >0: retain only the newest K epoch artifacts
    compute_dtype: str = "bfloat16"        # backbone compute dtype; margin math stays fp32
    use_pallas: bool = False               # fused Pallas DAMSM kernel (see ops/damsm_pallas.py perf note)
    fused_optimizer: bool = False          # per-group flattened optimizer updates (engine/optim.py; measured SLOWER on v5e — keep off)
    stacked_optimizer: bool = True         # same-(shape,dtype) leaf-bucket stacked optimizer updates (engine/optim.py; +12% with bf16 moments, DEVIATIONS #21)
    stack_max_elems: int = 32768           # stacked_optimizer: only stack leaves <= this many elements (0 = all); big GEMM kernels stay per-leaf (full stacking measured SLOWER)
    adam_moments_dtype: str = "bfloat16"   # Adam moment storage dtype ("float32" | "bfloat16"); bf16 halves optimizer-state HBM traffic (DEVIATIONS #21)
    grads_dtype: str = "float32"           # grad-tree dtype at the jax.grad boundary ("float32" | "bfloat16"); bf16 halves dW-write/clip/Adam-read grad traffic (engine/optim.cast_grads; A/B in docs/BENCHMARKS.md)
    fused_ln: bool = False                 # single-kernel Pallas LayerNorm in the text tower (ops/layernorm_pallas.py; interpret-mode on CPU); measured -2.8%, kept as fused-kernel reference (docs/BENCHMARKS.md)
    fused_dropout: bool = False            # one-RNG-call dropout plan for the text tower (models/text_bert._DropPlan); A/B in docs/BENCHMARKS.md
    fused_block: str = "none"              # Pallas mega-kernels in the text tower ("none"|"ffn"|"attn"|"both"|"tower": ops/block_pallas.py — half-layer kernels, or "tower" = ALL layers in one kernel fwd + one bwd with grid-streamed weights; post-LN gelu archs only); A/B in docs/BENCHMARKS.md
    lazy_embedding_adam: bool = False      # row-sparse (LazyAdam) update for large embedding tables in the encoder group (engine/optim.py r3)
    rnn_unroll: int = 18                   # lax.scan unroll factor for the bi-LSTM/GRU scans (models/text_rnn.py); 18 fully unrolls the reference T=18 (+5% LSTM step, docs/BENCHMARKS.md; param-tree-neutral)
    prng_impl: str = "rbg"                 # dropout-mask PRNG ("rbg" | "threefry2x32"); threefry costs ~14% of the stage-1 step
    xla_opts: str = "none"                 # XLA compiler-option preset for the jitted stage-1 train step (utils/xla_opts.py; TPU-only). The r3 "allsched +12%" adoption did NOT survive a robust re-measure (11.05 vs 11.07 ms back-to-back — the original delta was two-sided marginal-timing noise, utils/benching.py docstring), so the default is back to compiler defaults
    xla_opts_stage2: str = "none"          # same for the stage-2 fusion step (always measured neutral-to-negative there)
    frozen_feature_cache: bool = False     # per-epoch precompute of the frozen backbone over the train set (engine/feature_cache.py): the conv tower leaves the train step; exact augmentation semantics (the cache re-derives each sample's counter-based RNG). A/B in docs/BENCHMARKS.md
    feature_cache_batch: int = 256         # precompute forward batch (one static padded shape -> one compile)
    uint8_images: bool = False             # ship images to the device as augmented uint8 RGB and normalize on-chip (ops/images.device_normalize): 4x less h2d than float32, identical values
    eval_table_mode: bool = False          # run_test via a deduplicated per-sample embedding table: embed each distinct (image, first-caption) side ONCE, score pairs by table lookup (engine/evaluate._table_score_loop). The protocol references far fewer distinct samples than 2x pairs, so forwards drop ~100-300x at the real pair lists; scores match the pair path to float tolerance (LSTM captions longer than lstm_words_num use a per-sample canonical crop — DEVIATIONS #23)

    # Anything else found in a YAML lands here and is still attribute-accessible.
    extras: Dict[str, Any] = field(default_factory=dict)

    def __getattr__(self, name: str) -> Any:
        extras = object.__getattribute__(self, "extras")
        if name in extras:
            return extras[name]
        raise AttributeError(f"TGFRConfig has no field {name!r}")

    def __post_init__(self) -> None:
        # Closed string enums: a typo must fail loudly at construction, not
        # silently select a fallback path (e.g. fused_block='towre' would
        # otherwise pass every gate and run fully unfused while the user
        # believes the megakernels are on).
        _enums = {
            "fused_block": ("none", "ffn", "attn", "both", "tower"),
            "prng_impl": ("rbg", "threefry2x32"),
            "adam_moments_dtype": ("float32", "bfloat16"),
            "grads_dtype": ("float32", "bfloat16"),
            "compute_dtype": ("float32", "bfloat16"),
        }
        for name, allowed in _enums.items():
            val = getattr(self, name)
            if val not in allowed:
                raise ValueError(
                    f"{name}={val!r} is not one of {allowed}")

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TGFRConfig":
        known = {f.name: f for f in dataclasses.fields(cls)}
        kwargs: Dict[str, Any] = {}
        extras: Dict[str, Any] = {}
        for key, value in d.items():
            if key == "TRAIN" and isinstance(value, dict):
                smooth = value.get("SMOOTH", {}) or {}
                kwargs["TRAIN"] = TrainCfg(
                    FLAG=_coerce("TRAIN.FLAG", value.get("FLAG", True), bool),
                    SMOOTH=TrainSmooth(
                        GAMMA1=_coerce("TRAIN.SMOOTH.GAMMA1", smooth.get("GAMMA1", 4.0), float),
                        GAMMA2=_coerce("TRAIN.SMOOTH.GAMMA2", smooth.get("GAMMA2", 5.0), float),
                        GAMMA3=_coerce("TRAIN.SMOOTH.GAMMA3", smooth.get("GAMMA3", 10.0), float),
                    ),
                )
            elif key in known:
                f = known[key]
                typ = f.type if isinstance(f.type, type) else None
                if typ is None:
                    tname = str(f.type)
                    typ = {"int": int, "float": float, "bool": bool, "str": str}.get(tname)
                if typ in (int, float, bool, str):
                    kwargs[key] = _coerce(key, value, typ)
                else:
                    kwargs[key] = value
            else:
                extras[key] = value
        cfg = cls(**kwargs)
        cfg.extras.update(extras)
        return cfg

    def replace(self, **updates: Any) -> "TGFRConfig":
        return dataclasses.replace(self, **updates)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d.update(d.pop("extras"))
        return d


def load_yaml(filename: str) -> TGFRConfig:
    """Load one YAML config file (reference: utils/utils.py:32-35)."""
    with open(filename, "r") as f:
        raw = yaml.safe_load(f) or {}
    return TGFRConfig.from_dict(raw)


def merge_args_yaml(args: Any) -> TGFRConfig:
    """Merge argparse namespace over a YAML file (reference: utils/utils.py:38-44).

    argparse values win over YAML, matching `args.update(opt)` in the reference.
    """
    opt = {k: v for k, v in vars(args).items() if v is not None}
    cfg_file = opt.get("cfg_file")
    cfg = load_yaml(cfg_file) if cfg_file else TGFRConfig()
    d = cfg.to_dict()
    d.update(opt)
    return TGFRConfig.from_dict(d)
