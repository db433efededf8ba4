"""Host-side batching loader with background prefetch.

Replaces torch DataLoader(num_workers=8) (reference: utils/prepare.py:213-242)
with a thread-pool prefetcher producing dicts of stacked numpy arrays. Batches
have static shapes (drop_last on train), so each step's device transfer jits
cleanly; double-buffered `jax.device_put` overlap lives in engine/ (the loader
stays framework-agnostic numpy).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

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
                 seed: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

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
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

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
