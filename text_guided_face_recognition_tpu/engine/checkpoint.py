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


def migrate_legacy_qkv(tree: Any) -> Any:
    """Concatenate legacy per-projection attention params into the fused
    layout: checkpoints saved before the QKV fusion (r2, models/text_bert.py
    'qkv' Dense) hold separate query/key/value Dense leaves; the fused kernel
    is their concatenation along the output axis ([q | k | v], matching the
    reshape (B, T, 3, heads, d_head) unpack order)."""
    import jax.numpy as jnp

    if not isinstance(tree, dict):
        return tree
    tree = {k: migrate_legacy_qkv(v) for k, v in tree.items()}
    if ({"query", "key", "value"} <= tree.keys() and "qkv" not in tree
            and isinstance(tree["query"], dict)
            and "kernel" in tree["query"]):
        q, k, v = tree["query"], tree["key"], tree["value"]
        fused: Dict[str, Any] = {"kernel": jnp.concatenate(
            [jnp.asarray(q["kernel"]), jnp.asarray(k["kernel"]),
             jnp.asarray(v["kernel"])], axis=-1)}
        if "bias" in q:
            fused["bias"] = jnp.concatenate(
                [jnp.asarray(q["bias"]), jnp.asarray(k["bias"]),
                 jnp.asarray(v["bias"])], axis=-1)
        tree = {kk: vv for kk, vv in tree.items()
                if kk not in ("query", "key", "value")}
        tree["qkv"] = fused
    return tree


def _cast_like(like: Any, full: Any) -> Any:
    """Map restored leaves onto `like`'s dtypes; raises on any remaining
    structure mismatch (the caller's error surface)."""
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda a, b: jnp.asarray(b, a.dtype), like, full)


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None,
                    partial: bool = False) -> Dict[str, Any]:
    """Restore a pytree; when `like` is given, restores with matching
    structure/dtypes (needed for sharded/typed restore). Checkpoints written
    before the QKV fusion are migrated transparently (migrate_legacy_qkv).

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
        full = ckptr.restore(path)
        missing = [k for k in like if k not in full]
        if missing:
            raise KeyError(f"checkpoint {path} lacks keys {missing}; "
                           f"has {list(full)}")
        return {k: _cast_like(like[k], migrate_legacy_qkv(full[k]))
                for k in like}
    try:
        return ckptr.restore(path, target=like)
    except Exception:
        # legacy layout (pre-qkv-fusion): raw-restore, migrate, re-fit
        full = ckptr.restore(path)
        return _cast_like(like, migrate_legacy_qkv(full))


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
