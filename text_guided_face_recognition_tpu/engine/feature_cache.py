"""Per-epoch frozen-backbone feature precompute.

Both training stages keep the COTS face backbone frozen (reference:
src/train_encoders_bert.py:150-156 eval()s the frozen model and wraps its
forward in no_grad via utils/modules.get_features; src/fusion_bert.py:57-60
likewise), so its forward for a training sample depends only on the image and
that epoch's augmentation draw — never on a trainable parameter. The torch
reference still re-runs the conv tower inside every train step; TPU-first we
restructure instead of translate:

  * run the backbone ONCE per epoch over the whole train set at a large
    inference batch (near-roofline MXU utilization, one compile),
  * cache (gl, lc) host-side aligned with dataset indices,
  * feed the train step features directly — the conv tower (B=32: ~1.2 ms of
    small sub-bandwidth convs, docs/BENCHMARKS.md profile) leaves the
    latency-bound step entirely, and the per-step h2d payload shrinks.

Semantics are exact, not approximate: each image is forwarded exactly once
per epoch either way, and the cache re-derives each sample's counter-based
RNG (seed, index, next-visit) so it sees the SAME augmentation the in-step
path would have sampled (data/datasets.py peek_augmented_image), while
__getitem__ consumes identical draws so caption choice is unchanged.
The only move is out of the step's critical path. A/B + amortized accounting
in docs/BENCHMARKS.md.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["FrozenFeatureCache"]


class FrozenFeatureCache:
    """Holds the per-epoch (gl, lc) arrays and the jitted inference forward.

    One instance per trainer; `refresh(dataset, frozen_vars)` recomputes the
    epoch's features and installs them on the dataset (set_feature_cache).
    Host decode of chunk i+1 overlaps the device forward of chunk i (the
    dispatch is async; materialization is deferred one iteration).
    """

    def __init__(self, backbone, args):
        from text_guided_face_recognition_tpu.ops import device_normalize
        self.batch = max(1, int(getattr(args, "feature_cache_batch", 256)))
        model_type = args.model_type

        def fwd(variables, img):
            img = device_normalize(img, model_type)  # uint8_images wire mode
            out = backbone.module.apply(variables, img, train=False)
            return out[0], out[1]  # adaface's extra norm output is unused

        self._fwd = jax.jit(fwd)
        self.gl: Optional[np.ndarray] = None
        self.lc: Optional[np.ndarray] = None
        self.last_refresh_s: float = 0.0

    def _store(self, n: int, start: int, k: int, gl, lc) -> None:
        gl = np.asarray(gl)
        lc = np.asarray(lc)
        if self.gl is None or self.gl.shape[0] != n:
            self.gl = np.empty((n,) + gl.shape[1:], gl.dtype)
            self.lc = np.empty((n,) + lc.shape[1:], lc.dtype)
        self.gl[start:start + k] = gl[:k]
        self.lc[start:start + k] = lc[:k]

    def refresh(self, dataset, frozen_vars: Dict[str, Any]) -> float:
        """Recompute features for every dataset index at its next-visit
        augmentation; returns wall seconds (also kept in last_refresh_s)."""
        t0 = time.perf_counter()
        n = len(dataset)
        pb = min(self.batch, n)
        pending = None  # (start, k, gl_dev, lc_dev) from the previous chunk
        for start in range(0, n, pb):
            k = min(pb, n - start)
            arr = np.stack([dataset.peek_augmented_image(i)
                            for i in range(start, start + k)])
            if k < pb:  # pad to the single static compile shape
                pad = np.zeros((pb - k,) + arr.shape[1:], arr.dtype)
                arr = np.concatenate([arr, pad], 0)
            gl_d, lc_d = self._fwd(frozen_vars, arr)  # async dispatch
            if pending is not None:
                self._store(n, *pending)
            pending = (start, k, gl_d, lc_d)
        if pending is not None:
            self._store(n, *pending)
        dataset.set_feature_cache({"gl": self.gl, "lc": self.lc})
        self.last_refresh_s = time.perf_counter() - t0
        return self.last_refresh_s
