"""Shared entry-point plumbing: path setup, argparse, seeding.

Mirrors the reference CLI convention (one `--cfg` flag defaulting into ./cfg,
e.g. reference src/test.py:20-29) plus TPU-native extras: `--synthetic` runs
on generated data (Face2Text images are not shipped), `--cpu` forces the local
CPU backend, and common schedule overrides for smoke runs.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".."))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def parse_args(default_cfg: str, description: str):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--cfg", dest="cfg_file", type=str,
                        default=os.path.join(ROOT, "cfg", default_cfg),
                        help="config file")
    parser.add_argument("--synthetic", action="store_true", default=None,
                        help="run on synthetic images/captions")
    parser.add_argument("--cpu", action="store_true", default=None,
                        help="force the CPU backend")
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--bert_type", type=str, default=None,
                        help="override text arch (e.g. groupvit for smoke runs)")
    parser.add_argument("--compute_dtype", type=str, default=None)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="cap steps per epoch (smoke runs)")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="override the config's dataset root (e.g. "
                             "caption_assets/face2text for real-captions "
                             "runs with --synthetic images)")
    # cross-stage chaining / eval-protocol overrides (argparse wins over
    # YAML, config.merge_args_yaml) — lets full-schedule chains and
    # protocol-scale evals run without per-run config-file churn
    parser.add_argument("--text_encoder_path", type=str, default=None)
    parser.add_argument("--image_encoder_path", type=str, default=None)
    parser.add_argument("--fusion_net_path", type=str, default=None)
    parser.add_argument("--test_pair_list", type=str, default=None)
    parser.add_argument("--test_sub", type=int, default=None)
    parser.add_argument("--eval_table_mode", action="store_true",
                        default=None,
                        help="score pairs via the deduplicated per-sample "
                             "embedding table (engine/evaluate.py)")
    parser.add_argument("--is_ident", action="store_true", default=None)
    parser.add_argument("--uint8_images", action="store_true", default=None,
                        help="ship augmented uint8 over the wire; the "
                             "device normalizes (4x smaller h2d)")
    args = parser.parse_args()
    return args


def setup(args_ns):
    """Merge YAML, seed RNGs, pick backend. Returns the merged config."""
    from text_guided_face_recognition_tpu.config import merge_args_yaml

    args = merge_args_yaml(args_ns)
    import jax
    if getattr(args_ns, "cpu", None):
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: compiles through the TPU tunnel are expensive.
    # Backend/host-scoped dir (utils/cache.py): CPU AOT entries from another
    # machine must never be loadable here (SIGILL hazard).
    from text_guided_face_recognition_tpu.utils.cache import (
        enable_compile_cache)
    enable_compile_cache()
    random.seed(args.manual_seed)
    import numpy as np
    np.random.seed(args.manual_seed)
    return args
