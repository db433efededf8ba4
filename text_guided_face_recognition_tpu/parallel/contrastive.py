"""Explicit-collective helpers for shard_map'ed contrastive training.

The default execution path (engine/stage1.py) relies on jit + sharding
annotations: XLA all-gathers the sharded embeddings when forming the B x B
score matrices. This module provides the *explicit* SPMD formulation for
shard_map users: gather the global negative set over the mesh axis, compute
each shard's rows of the contrastive matrix locally, and psum-average.

Matches the reference semantics where nn.DataParallel gathers the full batch
onto device 0 before every loss (SURVEY.md §2.12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gather_global_negatives", "psum_mean", "local_diag_labels"]


def gather_global_negatives(x: jnp.ndarray, axis_name: str = "data"
                            ) -> jnp.ndarray:
    """all_gather along the mesh axis and flatten into the batch dim:
    (b_local, ...) -> (b_local * n_dev, ...), ordered by device index."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def local_diag_labels(local_batch: int, axis_name: str = "data") -> jnp.ndarray:
    """Diagonal (matching-pair) labels for this shard's rows against the
    gathered global columns."""
    idx = jax.lax.axis_index(axis_name)
    return idx * local_batch + jnp.arange(local_batch)


def psum_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Mean over the mesh axis (per-shard row-means -> global mean)."""
    return jax.lax.pmean(x, axis_name)
