"""Device-prefetch pipeline + multi-host input sharding.

parallel.prefetch_to_device keeps H2D transfers ahead of consumption (the
TPU-side replacement for the reference's pinned-memory torch DataLoader,
utils/prepare.py:213-242); DataLoader(process_shard=...) yields one host's
slice of every global batch for multi-host pods (data/loader.py).
"""

import numpy as np
import pytest

from text_guided_face_recognition_tpu.data.loader import DataLoader
from text_guided_face_recognition_tpu.parallel import (
    make_mesh,
    prefetch_to_device,
    shard_batch,
)


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((4,), i, np.float32), "idx": np.int32(i)}


def _all_batches(dl):
    return list(iter(dl))


def test_process_shards_reassemble_to_global_batches():
    ds = _ArrayDataset(32)
    kw = dict(batch_size=8, shuffle=True, drop_last=True, num_workers=1,
              seed=7)
    global_batches = _all_batches(DataLoader(ds, **kw))
    shard_batches = [
        _all_batches(DataLoader(ds, process_shard=(i, 2), **kw))
        for i in range(2)
    ]
    assert len(shard_batches[0]) == len(global_batches)
    for b, g in enumerate(global_batches):
        local = [shard_batches[i][b] for i in range(2)]
        assert all(lb["x"].shape[0] == 4 for lb in local)
        np.testing.assert_array_equal(
            np.concatenate([lb["idx"] for lb in local]), g["idx"])
        np.testing.assert_array_equal(
            np.concatenate([lb["x"] for lb in local]), g["x"])


def test_process_shard_validation():
    ds = _ArrayDataset(16)
    with pytest.raises(ValueError):  # batch not divisible
        DataLoader(ds, batch_size=6, drop_last=True, process_shard=(0, 4))
    with pytest.raises(ValueError):  # ragged final batch can't shard
        DataLoader(ds, batch_size=8, drop_last=False, process_shard=(0, 2))
    with pytest.raises(ValueError):  # index out of range
        DataLoader(ds, batch_size=8, drop_last=True, process_shard=(2, 2))


def _host_batches(n, b):
    for s in range(n):
        yield {"x": np.full((b, 3), s, np.float32),
               "key": np.asarray([f"k{s}"] * b),
               "cls_id": np.arange(b, dtype=np.int32) + s}


@pytest.mark.parametrize("mesh_size", [None, 8])
def test_prefetch_to_device_preserves_order_and_values(mesh_size):
    import jax
    mesh = make_mesh(mesh_size) if mesh_size else None
    out = list(prefetch_to_device(_host_batches(5, 8), mesh,
                                  drop_keys=("key",)))
    assert len(out) == 5
    for s, db in enumerate(out):
        assert "key" not in db
        assert isinstance(db["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(db["x"]),
                                      np.full((8, 3), s, np.float32))
        np.testing.assert_array_equal(np.asarray(db["cls_id"]),
                                      np.arange(8) + s)
        if mesh is not None:
            assert len(db["x"].sharding.device_set) == 8


def test_prefetch_issues_transfers_ahead():
    """The generator must pull `size` host batches before yielding the first
    one (that is what overlaps transfer with compute)."""
    pulled = []

    def tracking_iter():
        for s in range(4):
            pulled.append(s)
            yield {"x": np.zeros((2, 2), np.float32)}

    gen = prefetch_to_device(tracking_iter(), None, size=2)
    next(gen)
    assert pulled == [0, 1, 2]  # 2 buffered at start + 1 refill on yield


def test_prefetch_short_iterator_and_early_break():
    # fewer batches than the buffer size
    out = list(prefetch_to_device(_host_batches(1, 4), None, size=3,
                                  drop_keys=("key",)))
    assert len(out) == 1
    # breaking mid-iteration leaves no error behind
    gen = prefetch_to_device(_host_batches(10, 4), None, size=2,
                             drop_keys=("key",))
    for i, _ in enumerate(gen):
        if i == 1:
            break


def test_shard_batch_replicates_on_none_mesh():
    import jax
    out = shard_batch({"x": np.ones((4, 2), np.float32)}, None)
    assert isinstance(out["x"], jax.Array)
