"""Host-side batching loader with background prefetch.

Replaces torch DataLoader(num_workers=8) (reference: utils/prepare.py:213-242)
with a thread-pool prefetcher producing dicts of stacked numpy arrays. Batches
have static shapes (drop_last on train), so each step's device transfer jits
cleanly; double-buffered `jax.device_put` overlap is
parallel.prefetch_to_device (the loader stays framework-agnostic numpy).

Multi-host: `process_shard=(index, count)` makes this loader yield only its
process's contiguous slice of every GLOBAL batch — all hosts draw the same
seeded permutation, so the global batch composition is identical to a
single-host run at the same seed; parallel.shard_batch assembles the global
jax.Array from the per-host slices with make_array_from_process_local_data.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

__all__ = ["DataLoader"]


def _collate(samples) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k in samples[0]:
        v0 = samples[0][k]
        if isinstance(v0, str):
            out[k] = np.asarray([s[k] for s in samples])
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 4,
                 seed: int = 0, prefetch: int = 2,
                 process_shard: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        if process_shard is not None:
            idx, count = process_shard
            if not (0 <= idx < count):
                raise ValueError(f"process_shard index {idx} out of range "
                                 f"for count {count}")
            if batch_size % count != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly across "
                    f"{count} processes")
            if not drop_last and count > 1:
                raise ValueError("process_shard requires drop_last=True "
                                 "(a ragged final batch cannot be split "
                                 "evenly across hosts)")
        self.process_shard = process_shard

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            full = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if self.process_shard is not None:
                pi, pc = self.process_shard
                local = self.batch_size // pc
                full = full[pi * local:(pi + 1) * local]
            yield full

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        stop = threading.Event()

        def produce():
            try:
                for batch_idx in self._batch_indices():
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__,
                                            batch_idx.tolist()))
                    q.put(_collate(samples))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            pool.shutdown(wait=False)
