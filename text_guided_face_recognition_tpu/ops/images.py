"""Device-side image normalization (uint8-on-the-wire mode).

`uint8_images=True` ships augmented uint8 RGB batches to the device — 4x
less host->device traffic than the float32 tensors the torch reference moves
(its ToTensor + Normalize run on the host: utils/dataset_utils.py:57-79).
The normalize itself (x/255*2-1, plus adaface's RGB->BGR permute) runs
on-chip in float32 — the same ops in the same order as the host path
(data/transforms._normalize/_to_bgr), so the resulting values are identical.
XLA fuses the cast+scale into the first conv's input, so the on-chip cost is
~zero; the win is pure wire bytes (PCIe on a TPU-VM, the ~38 MB/s tunnel on
this harness — docs/BENCHMARKS.md e2e attribution).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["device_normalize"]


def device_normalize(img: jnp.ndarray, model_type: str = "arcface"):
    """uint8 RGB -> float32 [-1, 1] (+BGR permute for adaface);
    already-float input passes through untouched (host-normalized path)."""
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        if model_type == "adaface":
            img = img[..., ::-1]
    return img
