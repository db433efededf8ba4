"""Fused Pallas LayerNorm (forward + backward) for the text towers.

Motivation (r3 per-op profile of the production stage-1 step,
docs/BENCHMARKS.md "Roofline"): the step is bound by many small
sub-bandwidth ops, and the LayerNorm family is one of the largest groups —
~1.35 ms/step across stat reduces (f32[32,24]), dgamma/dbeta reduces
(f32[768]) and their glue, spread over ~25 LN sites x fwd+bwd in the
12-layer tower. XLA lowers each LN fwd to ~2 kernels and each bwd to ~3;
this op is exactly 1 kernel each way (stats, normalize, affine fused;
dx + dgamma + dbeta in one pass — the backward recomputes the row stats
from the resident x block instead of round-tripping them through HBM),
cutting the executed-kernel count by ~60% for the whole group.

Semantics: y = (x - mean) / sqrt(var + eps) * gamma + beta over the last
axis, stats in fp32 like flax nn.LayerNorm(dtype=bfloat16) (which upcasts
for mean/var); backward matches jax.grad of the reference formula (parity
tests in tests/test_fused_ln.py, interpret mode on CPU).

Used by models/text_bert.py behind the `fused_ln` flag.

MEASURED OUTCOME (r3, honest back-to-back chained-marginal inside the full
stage-1 train step at B=32): 11.33 ms vs 11.02 ms base — NEGATIVE (-2.8%).
The custom_vjp call boundary is opaque to XLA, which un-fuses the
residual-add/LN glue the compiler was already fusing; that costs more than
the saved stat/grad kernels at these tiny (768-token) shapes. `fused_ln`
stays opt-in/off — this file remains as a verified-correct fused-kernel
reference (tests/test_fused_ln.py: fwd, grads-vs-autodiff, module-swap).

Reference semantics being accelerated: the LayerNorms inside the HF text
towers the reference wraps (reference models/models.py:144-167 — torch
nn.LayerNorm inside BertModel et al.).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["layernorm_fused"]

_BLOCK_ROWS = 256  # rows (tokens) per grid step; f32 working set ~3 MB


def _row_stats(x, eps: float):
    h = x.shape[1]
    mean = jnp.sum(x, axis=1, keepdims=True) / h           # (R, 1)
    xc = x - mean
    var = jnp.sum(xc * xc, axis=1, keepdims=True) / h
    return xc, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                       # (R, H)
    xc, rstd = _row_stats(x, eps)
    y = (xc * rstd) * g_ref[:].astype(jnp.float32) \
        + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(dy_ref, x_ref, g_ref, dx_ref, dg_ref, db_ref, *, eps: float):
    i = pl.program_id(0)
    dy = dy_ref[:].astype(jnp.float32)                     # (R, H)
    x = x_ref[:].astype(jnp.float32)
    xc, rstd = _row_stats(x, eps)                          # recomputed
    xhat = xc * rstd
    g = g_ref[:].astype(jnp.float32)                       # (1, H)

    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)         # (1, H)
    db = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dg_ref[:] = dg
        db_ref[:] = db

    @pl.when(i > 0)
    def _acc():
        dg_ref[:] += dg
        db_ref[:] += db

    # dx = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))
    h = x.shape[1]
    dxhat = dy * g
    m1 = jnp.sum(dxhat, axis=1, keepdims=True) / h
    m2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True) / h
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _grid_block(n: int):
    # largest divisor of n <= _BLOCK_ROWS: no partial trailing block, so the
    # dgamma/dbeta accumulation never sums over out-of-bounds padding rows
    # (n = B*T here, always divisible by a power of two well above 8)
    for block in range(min(_BLOCK_ROWS, n), 0, -1):
        if n % block == 0:
            return n // block, block
    return n, 1


def _fwd_call(x2, g2, b2, eps: float, interpret: bool):
    n, h = x2.shape
    grid, block = _grid_block(n)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h), x2.dtype),
        interpret=interpret,
    )(x2, g2, b2)


def _bwd_call(dy2, x2, g2, eps: float, interpret: bool):
    n, h = x2.shape
    grid, block = _grid_block(n)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), dy2.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ],
        interpret=interpret,
    )(dy2, x2, g2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layernorm_fused(x, gamma, beta, eps: float = 1e-12,
                    interpret: bool = False):
    """Fused LayerNorm over the last axis of `x` (any leading shape).

    gamma/beta: (H,). Returns y in x's dtype; stats in fp32.
    `interpret=True` runs the kernels in interpret mode (CPU tests)."""
    y, _ = _ln_fwd(x, gamma, beta, eps, interpret)
    return y


def _ln_fwd(x, gamma, beta, eps: float, interpret: bool):
    lead, h = x.shape[:-1], x.shape[-1]
    y = _fwd_call(x.reshape(-1, h), gamma.reshape(1, h), beta.reshape(1, h),
                  eps, interpret)
    return y.reshape(*lead, h), (x, gamma)


def _ln_bwd(eps: float, interpret: bool, res, dy):
    x, gamma = res
    h = x.shape[-1]
    dx, dg, db = _bwd_call(dy.reshape(-1, h), x.reshape(-1, h),
                           gamma.reshape(1, h), eps, interpret)
    return (dx.reshape(x.shape),
            dg.reshape(-1).astype(gamma.dtype),
            db.reshape(-1).astype(gamma.dtype))


layernorm_fused.defvjp(_ln_fwd, _ln_bwd)
