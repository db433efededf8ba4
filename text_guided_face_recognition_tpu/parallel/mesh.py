"""Device mesh construction + sharding rules.

The reference's only parallelism is single-process nn.DataParallel over CUDA
peers (SURVEY.md §2.12). The TPU-native equivalent: a 1-D `jax.sharding.Mesh`
over ICI with the batch sharded on the "data" axis and parameters replicated.
Train steps are jit-compiled with these shardings; the B x B contrastive score
matrices contract the sharded batch axis against itself, so XLA inserts the
all-gather of embeddings over ICI automatically — preserving the reference's
batch-global-negatives semantics (DataParallel computes losses on the gathered
full batch on device 0; utils/prepare.py wrap sites).

The axis layout is DCN-ready: `make_mesh` accepts extra axes (e.g.
("replica", "data")) so cross-slice data parallelism can be layered on without
touching the train steps.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_data_mesh", "batch_sharding", "replicated",
           "shard_batch", "prefetch_to_device"]


def make_mesh(num_devices: int = 0,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """1-D (or reshaped N-D) mesh over the first `num_devices` devices
    (0 = all visible)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    n = len(devs)
    if len(axis_names) == 1:
        shape: Tuple[int, ...] = (n,)
    else:
        # put everything on the last (innermost/ICI-fastest) axis by default
        shape = (1,) * (len(axis_names) - 1) + (n,)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def make_data_mesh(num_devices: int, batch_size: int) -> Optional[Mesh]:
    """Data mesh whose size divides the batch (sharding requires it); None
    when only one device would be used."""
    avail = len(jax.devices())
    n = num_devices if num_devices and num_devices > 0 else avail
    n = min(n, avail)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    return make_mesh(n)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for per-sample arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Optional[Mesh], axis: str = "data",
                expected_global_rows: Optional[int] = None) -> dict:
    """device_put each array with its batch axis sharded (host -> HBM).

    Multi-host (process_count > 1): each process holds only its local slice
    of the global batch (data/loader.py `process_shard`); the global array is
    assembled with `jax.make_array_from_process_local_data` — no cross-host
    data movement, addressable shards stay on their producing host.

    `expected_global_rows` (the run's global batch size) is the guard
    against a full (non-process-sharded) batch routed here by mistake on a
    pod: make_array_from_process_local_data happily assembles local rows x
    process_count whatever the local size is — a full batch would silently
    become a process_count-times-larger global batch with every host's copy
    concatenated, duplicating data instead of erroring (first caught by the
    2-process fixture, tests/_mp_worker.py)."""
    if mesh is None or mesh.size == 1:
        return jax.device_put(batch)
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        def _assemble(k, v):
            local = np.asarray(v)
            global_rows = local.shape[0] * jax.process_count()
            if expected_global_rows is not None and \
                    global_rows != expected_global_rows:
                raise ValueError(
                    f"shard_batch['{k}']: local batch has {local.shape[0]} "
                    f"rows -> {global_rows} global across "
                    f"{jax.process_count()} processes, but the run's global "
                    f"batch is {expected_global_rows}; on a pod each process "
                    "must feed only its process_shard slice "
                    "(data/loader.py) — a full batch here would silently "
                    "duplicate data into the global array")
            return jax.make_array_from_process_local_data(
                sh, local, (global_rows, *local.shape[1:]))
        return {k: _assemble(k, v) for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def prefetch_to_device(iterator, mesh: Optional[Mesh], size: int = 2,
                       drop_keys: Sequence[str] = ()):
    """Double-buffered host->HBM pipeline over a host batch iterator.

    Keeps up to `size` batches' `shard_batch` transfers in flight ahead of
    consumption, so the H2D copy of step n+1 overlaps the device compute of
    step n (jax transfers are asynchronous — issuing device_put early is
    enough; no extra threads). The torch-reference equivalent is
    DataLoader(pin_memory) + the implicit overlap CUDA streams give
    nn.DataParallel (reference: utils/prepare.py:213-242); on TPU the
    transfer must be issued ahead explicitly or each step eats the copy
    latency synchronously."""
    from collections import deque
    buf: deque = deque()

    # pod guard: a loader that isn't process-sharded would feed the FULL
    # batch from every host (see shard_batch's expected_global_rows note);
    # loaders expose batch_size (global) + process_shard, so wire the check
    expected = None
    if mesh is not None and mesh.size > 1 and jax.process_count() > 1:
        expected = getattr(iterator, "batch_size", None)
        if expected is not None and \
                getattr(iterator, "process_shard", None) is None:
            raise ValueError(
                "prefetch_to_device on a pod requires a process-sharded "
                "loader (DataLoader(process_shard=(process_index, "
                "process_count))); this loader would feed its full batch "
                "from every host")
    it = iter(iterator)

    def _put(b: dict) -> dict:
        if drop_keys:
            b = {k: v for k, v in b.items() if k not in drop_keys}
        return shard_batch(b, mesh, expected_global_rows=expected)

    try:
        while len(buf) < max(1, size):
            buf.append(_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
