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

__all__ = ["save_checkpoint", "load_checkpoint", "load_train_state",
           "checkpoint_exists", "prune_checkpoints"]


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


def _raw_restore(ckptr, path: str):
    """Target-less restore that survives cross-backend moves.

    A checkpoint written on one backend embeds per-leaf
    SingleDeviceSharding metadata naming that device (e.g. "TPU v5
    lite0"); orbax's target-less restore replays that sharding and fails
    with "Device ... was not found in jax.local_devices()" on any other
    runtime (surfaced restoring a TPU-written soak checkpoint on CPU).
    On that failure, rebuild an abstract target from the stored tree
    metadata with a concrete local sharding and restore onto the default
    device of THIS runtime."""
    import jax
    from jax.sharding import SingleDeviceSharding

    try:
        return ckptr.restore(path)
    except ValueError:
        sh = SingleDeviceSharding(jax.local_devices()[0])
        target = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh),
            ckptr.metadata(path).item_metadata)
        return ckptr.restore(path, target=target)


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
        return _raw_restore(ckptr, path)
    if partial:
        full = _raw_restore(ckptr, path)
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
        full = _raw_restore(ckptr, path)
        return _cast_like(like, migrate_legacy_qkv(full))


def load_train_state(path: str, like: Dict[str, Any], args, tx_maker,
                     params: Dict[str, Any], group_of) -> Dict[str, Any]:
    """Restore a full train-state artifact (save_state layout), migrating
    legacy OPTIMIZER-STATE formats when the stored tree predates the r3
    optimizer defaults (DEVIATIONS #21: `stacked_optimizer` bucket layout +
    `adam_moments_dtype: bfloat16` changed the opt-state tree; r1/r2
    checkpoints hold per-leaf multi_transform state with fp32 moments).

    Tries the current format first; on mismatch, restores against each
    shipped legacy layout (engine/optim.legacy_tx_variants) and carries LRs,
    step counts, Adam moments (re-stacked/re-cast), and SGD traces into the
    current format (engine/optim.convert_legacy_opt_state). Raises a
    diagnosis naming the knobs if no known format fits."""
    import jax

    from text_guided_face_recognition_tpu.engine.optim import (
        convert_legacy_opt_state, legacy_tx_variants)

    try:
        return load_checkpoint(path, like=like)
    except Exception as base_err:  # noqa: BLE001 — orbax raises varied types
        errors = [f"current format: {type(base_err).__name__}: {base_err}"]
    max_elems = (int(getattr(args, "stack_max_elems", 0) or 0)
                 if getattr(args, "stacked_optimizer", False) else 0)
    for name, ltx in legacy_tx_variants(args, tx_maker):
        legacy_like = dict(like)
        legacy_like["opt_state"] = jax.eval_shape(ltx.init, params)
        try:
            tree = load_checkpoint(path, like=legacy_like)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: {type(e).__name__}")
            continue
        tree["opt_state"] = convert_legacy_opt_state(
            tree["opt_state"], like["opt_state"], params, group_of,
            max_elems)
        print(f"checkpoint {path}: migrated legacy optimizer state "
              f"[{name}] to the current format (stacked_optimizer="
              f"{getattr(args, 'stacked_optimizer', False)}, "
              f"adam_moments_dtype="
              f"{getattr(args, 'adam_moments_dtype', 'float32')})")
        return tree
    raise ValueError(
        f"checkpoint {path} matches no known train-state format.\n"
        f"Its optimizer state fits neither the current layout nor the "
        f"legacy per-leaf formats. If it was written under non-default "
        f"optimizer knobs, set `stacked_optimizer` / `stack_max_elems` / "
        f"`adam_moments_dtype` / `apply_grad_clip` back to the values used "
        f"when it was saved and resume with those.\nAttempts:\n  " +
        "\n  ".join(errors))


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
