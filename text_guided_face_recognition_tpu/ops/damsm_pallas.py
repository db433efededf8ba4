"""Fused Pallas kernel for the DAMSM word-region similarity matrix.

Motivation (profile of the jnp path in ops/attention.py at the reference's
stage-1 shapes B=32, T=22, R=196, D=256): the op is HBM-bound — the
(B*T, B*R) attention logits (~18 MB fp32) are materialized and re-read by two
softmax passes and the weighted-context matmul, ~150 MB of HBM traffic per
step. This kernel processes one image per grid step, keeping that image's
entire attention pipeline (logits -> masked softmax over words -> gamma1
softmax over regions -> weighted context -> cosine -> gamma2-LSE) resident in
VMEM (~1.5 MB), so HBM sees only the inputs once and the (B, B) output:
~25 MB/step, a ~6x traffic cut, with both matmuls in MXU-friendly shapes
((R, D) x (D, B*T) and (B*T, R) x (R, D)).

Semantics identical to ops.attention.damsm_similarity (itself the vectorized
form of reference models/losses.py:61-135 + models/attention.py:10-43);
numerical parity is tested in interpret mode and verified compiled on TPU v5e
(max abs diff 2.4e-6). The public entry `damsm_similarity_fused` is a
custom-VJP op: fused forward, XLA-einsum backward (recomputation — the
backward was already XLA's job in the jnp path).

PERF NOTE (TPU v5e, honest scan-chained A/B inside the full stage-1 train
step, tools/bench_pallas_ab.py): pallas/xla throughput ratio 0.987 at B=32,
0.970 at B=128, 0.956 at B=256 — XLA's two giant batched GEMMs (which
overlap with the rest of the step) win at every batch size, and the
hypothesized large-batch crossover does not materialize. Kept opt-in
(`use_pallas`) as a verified-correct fused-kernel reference. The per-image grid serializes 32 modest
(196x704x256) matmul pipelines, while the XLA path runs two giant batched
GEMMs that overlap with the rest of the step; the op is a small fraction of
step time, so the saved HBM traffic doesn't pay for the lost MXU utilization
at this batch size. Kept opt-in (`use_pallas: true`) for large-batch /
standalone-retrieval regimes; defaults use the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from text_guided_face_recognition_tpu.ops.attention import damsm_similarity

__all__ = ["damsm_similarity_pallas", "damsm_similarity_fused"]

_BIG = 1e30  # large-negative masking instead of -inf: keeps VPU exp/max NaN-free


def _mm(a, b_, dims):
    return jax.lax.dot_general(a, b_, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(words_ref, regions_ref, mask_ref, out_ref, *, b: int, t: int,
            gamma1: float, gamma2: float, eps: float):
    """Grid step = one image j. words (T*B, D) in t-major row order
    (row l = tt*B + i); regions block (1, R, D); mask (1, T*B) t-major;
    out full (B, B).

    Mosaic-friendly formulation: with word slots laid out t-major, each
    caption's T entries sit at a fixed offset within T contiguous (.., B)
    slices, so the per-caption softmax-over-words becomes an exact,
    statically-unrolled max/sum over T lane slices — no lane-splitting
    reshapes, no cross-segment underflow.
    """
    ctx = regions_ref[0].astype(jnp.float32)        # (R, D)
    words = words_ref[:].astype(jnp.float32)        # (TB, D)
    maskf = mask_ref[:]                              # (1, TB)

    # attention logits for every caption-word against this image's regions
    a = _mm(ctx, words, ((1,), (1,)))                # (R, TB)
    a = a + (maskf - 1.0) * _BIG                     # mask invalid words

    # exact per-caption softmax over words: T static lane slices of width B
    slices = [a[:, tt * b:(tt + 1) * b] for tt in range(t)]
    segmax = slices[0]
    for sl in slices[1:]:
        segmax = jnp.maximum(segmax, sl)             # (R, B)
    exps = [jnp.exp(sl - segmax) for sl in slices]
    segsum = exps[0]
    for ex in exps[1:]:
        segsum = segsum + ex
    segsum = jnp.maximum(segsum, eps)
    p = jnp.concatenate([ex / segsum for ex in exps], axis=1)  # (R, TB)

    # gamma1-scaled softmax over regions per (caption, word)
    q = jnp.swapaxes(p, 0, 1) * gamma1               # (TB, R)
    q = q - jnp.max(q, axis=-1, keepdims=True)
    eq = jnp.exp(q)
    q = eq / jnp.maximum(jnp.sum(eq, axis=-1, keepdims=True), eps)

    # weighted region context per word + cosine
    w = _mm(q, ctx, ((1,), (0,)))                    # (TB, D)
    num = jnp.sum(words * w, axis=-1, keepdims=True)
    den = jnp.sqrt(jnp.sum(words * words, axis=-1, keepdims=True)) * \
        jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True))
    cos = num / jnp.maximum(den, eps)                # (TB, 1)

    # gamma2-smoothed LSE over valid words: T static sublane slices
    z = cos * gamma2 + jnp.swapaxes(maskf - 1.0, 0, 1) * _BIG
    zrows = [z[tt * b:(tt + 1) * b, :] for tt in range(t)]
    zmax = zrows[0]
    for zr in zrows[1:]:
        zmax = jnp.maximum(zmax, zr)                 # (B, 1) per-caption max
    e2 = zrows[0] * 0.0
    for zr in zrows:
        e2 = e2 + jnp.exp(zr - zmax)
    lse = jnp.log(jnp.maximum(e2, 1e-38)) + zmax     # (B, 1)
    j = pl.program_id(0)
    out_ref[pl.ds(j, 1), :] = jnp.swapaxes(lse, 0, 1)  # sim[j, :]


def damsm_similarity_pallas(
    words: jnp.ndarray,          # (B, D, T)
    regions: jnp.ndarray,        # (B, D, R)
    gamma1: float,
    gamma2: float,
    word_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward; returns sim (B_img, B_cap) like damsm_similarity."""
    b, d, t = words.shape
    r = regions.shape[2]
    # t-major word-slot layout: row l = tt * B + i (see _kernel docstring)
    words_flat = jnp.transpose(words, (2, 0, 1)).reshape(t * b, d)
    regions_rd = jnp.swapaxes(regions, 1, 2)         # (B, R, D)
    mask = (jnp.ones((b, t), jnp.float32) if word_mask is None
            else word_mask.astype(jnp.float32))
    mask = jnp.swapaxes(mask, 0, 1).reshape(1, t * b)

    kernel = functools.partial(_kernel, b=b, t=t, gamma1=float(gamma1),
                               gamma2=float(gamma2), eps=eps)
    flops_per_j = 2 * r * (b * t) * d * 2
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b * t, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # words: resident
            pl.BlockSpec((1, r, d), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),       # this image's regions
            pl.BlockSpec((1, b * t), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # full-array output block: each grid step writes its row (a (1, b)
        # block would violate the (8, 128) sublane/lane tiling minimum)
        out_specs=pl.BlockSpec((b, b), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_j * b,
            bytes_accessed=(b * t * d + b * r * d + b * b) * 4,
            transcendentals=b * (r * b * t + b * t * (r + 1))),
        interpret=interpret,
    )(words_flat, regions_rd, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def damsm_similarity_fused(words, regions, gamma1, gamma2, word_mask=None):
    """Custom-VJP DAMSM similarity: Pallas forward, XLA-recompute backward.

    Drop-in for ops.attention.damsm_similarity (same signature semantics;
    gammas static)."""
    return damsm_similarity_pallas(words, regions, gamma1, gamma2, word_mask)


def _fwd(words, regions, gamma1, gamma2, word_mask=None):
    sim = damsm_similarity_pallas(words, regions, gamma1, gamma2, word_mask)
    return sim, (words, regions, word_mask)


def _bwd(gamma1, gamma2, res, g):
    words, regions, word_mask = res
    _, vjp = jax.vjp(
        lambda w, r: damsm_similarity(w, r, gamma1, gamma2, word_mask), words,
        regions)
    dw, dr = vjp(g)
    return dw, dr, None


damsm_similarity_fused.defvjp(_fwd, _bwd)
