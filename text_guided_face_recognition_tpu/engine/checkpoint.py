"""Orbax checkpointing.

Replaces the reference's torch.save state-dict bundles (reference:
src/train_encoders_bert.py:59-80, src/fusion_bert.py:166-191, loaders in
utils/utils.py:54-88) with Orbax pytree checkpoints while keeping the same
two-artifact layout per stage:

  stage 1:  <dir>/<model_type>_image_encoder_<epoch>   {"image_head": ...}
            <dir>/<bert_type>_text_encoder_<epoch>     {"model": ..., "head": ...}
  stage 2:  <dir>/fusion_<type>_<model>_<epoch>        {"net": ..., "image_head": ...}
            <dir>/encoder_<en>_<type>_<epoch>          {"model": ..., "head": ...}

Each artifact holds {params[, batch_stats][, margin_stats][, opt_state],
epoch} so training resumes deterministically.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_exists"]


def save_checkpoint(path: str, tree: Dict[str, Any]) -> str:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def checkpoint_exists(path: str) -> bool:
    path = os.path.abspath(path)
    return os.path.isdir(path) and bool(os.listdir(path))


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore a pytree; when `like` is given, restores with matching
    structure/dtypes (needed for sharded/typed restore)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target=like)
