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

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_exists",
           "prune_checkpoints"]


def save_checkpoint(path: str, tree: Dict[str, Any]) -> str:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def checkpoint_exists(path: str) -> bool:
    path = os.path.abspath(path)
    return os.path.isdir(path) and bool(os.listdir(path))


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None,
                    partial: bool = False) -> Dict[str, Any]:
    """Restore a pytree; when `like` is given, restores with matching
    structure/dtypes (needed for sharded/typed restore).

    partial=True restores only the keys present in `like` — needed because
    the stage artifacts keep the reference's bundled layouts (e.g. the fusion
    checkpoint holds both 'net' and 'image_head':
    src/fusion_bert.py:180-182) while each prepare_* factory loads only its
    own subtree."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    if partial:
        import jax
        import jax.numpy as jnp
        full = ckptr.restore(path)
        missing = [k for k in like if k not in full]
        if missing:
            raise KeyError(f"checkpoint {path} lacks keys {missing}; "
                           f"has {list(full)}")
        return {k: jax.tree_util.tree_map(
                    lambda a, b: jnp.asarray(b, a.dtype), like[k], full[k])
                for k in like}
    return ckptr.restore(path, target=like)


def prune_checkpoints(save_dir: str, keep_last: int) -> None:
    """Retain only the newest `keep_last` epochs of each artifact family in
    `save_dir` (names end in `_<epoch>`). keep_last <= 0 keeps everything —
    the reference behavior (it never prunes; a 36-epoch run accumulates
    ~900 MB of per-epoch state)."""
    import re
    import shutil
    from collections import defaultdict

    if keep_last <= 0 or not os.path.isdir(save_dir):
        return
    families = defaultdict(list)
    for name in os.listdir(save_dir):
        m = re.match(r"^(.*)_(\d+)$", name)
        if m and os.path.isdir(os.path.join(save_dir, name)):
            families[m.group(1)].append((int(m.group(2)), name))
    for fam, entries in families.items():
        entries.sort()
        for _epoch, name in entries[:-keep_last]:
            shutil.rmtree(os.path.join(save_dir, name), ignore_errors=True)
