"""Fused Pallas transformer HALF-LAYER kernels (post-LN/BERT style).

Motivation (docs/ROADMAP.md #1, r3-final profile): the stage-1 BERT train
step is bound by thousands of SMALL sub-bandwidth ops — LN stat/grad
reduces, dropout RNG+mask plumbing, bias-grad reduces, residual glue —
while the GEMMs themselves already run near MXU peak. Per-op fusions
(single-site Pallas LayerNorm) measured NEGATIVE because each custom_vjp
boundary blocks XLA's surrounding glue fusions. These kernels take the
opposite scale: ONE Pallas kernel per transformer half-layer each way —

  attn_block: y = LN1(x + drop(MHSA(x)))          [fwd 1 kernel, bwd 1 kernel]
  ffn_block:  z = LN2(y + drop(W2 gelu(W1 y)))    [fwd 1 kernel, bwd 1 kernel]

so all the glue lives INSIDE the kernel and the only boundaries left are
GEMM-input edges XLA never fuses across anyway. At the flagship shapes
(B=32, T=24, H=768: 768 token rows) every operand fits VMEM at once — the
kernels run gridless with weights fully resident (measured ceiling with
`vmem_limit_bytes=100MB`: >33 MB resident compiles and runs on v5e).

Semantics match models/text_bert._Block (postln branch) exactly:
  * GEMMs in the caller dtype (bf16 production) with f32 MXU accumulation,
    bias added in caller dtype — same rounding as flax nn.Dense(dtype=bf16).
  * LayerNorm stats in f32 (delta vs nn.LayerNorm(dtype=bf16) is below bf16
    resolution — see FusedLayerNorm docstring).
  * exact-erf GELU via the Abramowitz-Stegun 7.1.26 rational approximation
    (max |gelu_AS - gelu_erf| = 7.2e-7; Mosaic has no erf primitive), and
    the backward uses the ANALYTIC derivative Phi(x) + x*phi(x) of the
    exact GELU, not autodiff of the approximation.
  * dropout: keep iff bits >= round(rate * 2^32) on uint32 bits, scaled by
    1/(1-rate) — bit-identical to models/text_bert._DropPlan (mask VALUES
    carry no parity constraint vs torch; keep-probability semantics do).
  * attention probs are rounded to the caller dtype after the f32 softmax
    (matching `probs.astype(self.dtype)` in _SelfAttention) and the saved
    residual is that same rounded tensor, so fwd and bwd see identical
    probs.

Backward derivations (per half-layer, all in ONE kernel):
  LN:      dr = rs*(dxhat - mean(dxhat) - xhat*mean(dxhat*xhat)),
           dgamma = sum(dz*xhat), dbeta = sum(dz)   [stats recomputed from
           the saved pre-LN residual r — no stat round-trip through HBM]
  FFN:     dgg = dr*dropmask; dW2 = gelu(f)^T dgg; da = dgg W2^T;
           df = da * gelu'(f); dW1 = x^T df; dx = dr + df W1^T
  MHSA:    dh = dr1*dropmask; dWo = o^T dh; do = dh Wo^T; per head:
           dv = p_drop^T do; dp = (do v^T)*probmask; ds = p*(dp - sum(dp*p));
           dq = ds k / sqrt(d); dk = ds^T q / sqrt(d);
           dWqkv = x^T dqkv; dx += dqkv Wqkv^T
  (softmax bwd needs no mask: p == 0 at masked keys, so ds vanishes there.)

Reference semantics being accelerated: the BertLayer stack inside the HF
towers the reference wraps (reference models/models.py:144-167), i.e. the
hot loop of /root/reference/src/train_encoders_bert.py:254-331.

Boundary-cost design (r3 profile of the first cut: the kernels removed
~3.8 ms of XLA fusion work but boundary copies added ~3.45 ms — materialized
f32->bf16 param converts, doubled weight prefetch copies, and 36 host-side
dropout-bits arrays):
  * params cross the boundary as FP32 MASTERS and are cast to the compute
    dtype INSIDE the kernel (same rounding as flax's per-use cast), so XLA
    materializes no bf16 weight buffers and dW cotangents come back f32
    with no convert pair;
  * dropout bits are generated IN-KERNEL by the Mosaic PRNG
    (pltpu.prng_seed / prng_random_bits) from a per-layer int32 seed; the
    backward reseeds identically and regenerates the same masks. Host-bits
    mode remains for the fused_dropout plan and for CPU interpret tests
    (the Mosaic PRNG has no CPU lowering).

Used by models/text_bert.py behind the `fused_block` config flag
(gated to post-LN archs with d_head == 64: bert/align).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ffn_block", "attn_block", "tower_block"]

_VMEM_LIMIT = 100 * 1024 * 1024  # measured OK well past 33 MB resident


def _params(**kw):
    kw.setdefault("vmem_limit_bytes", _VMEM_LIMIT)
    return pltpu.CompilerParams(**kw)


def _f32(x):
    return x.astype(jnp.float32)


def _threshold(rate: float) -> jnp.ndarray:
    # keep iff bits >= threshold: P(keep) = 1 - rate exactly in u32 space
    # (identical to models/text_bert._DropPlan)
    return jnp.uint32(min(int(round(rate * (1 << 32))), (1 << 32) - 1))


def _drop(x, bits_u32, rate: float, dtype):
    """Apply _DropPlan-semantics dropout; `rate` is static."""
    keep = bits_u32 >= _threshold(rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), dtype))


def _erf_as(x):
    """Abramowitz-Stegun 7.1.26 rational erf (f32, |err| <= 1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu(x):
    """Exact-erf GELU on f32 (via the A-S erf)."""
    return 0.5 * x * (1.0 + _erf_as(x * _INV_SQRT2))


def _dgelu(x):
    """Analytic d/dx of exact GELU: Phi(x) + x*phi(x), f32."""
    phi = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf_as(x * _INV_SQRT2)) + x * phi


def _ln_fwd_f32(r, gamma, beta, eps: float):
    """y = xhat*gamma + beta with f32 stats; returns y (f32)."""
    h = r.shape[-1]
    mean = jnp.sum(r, axis=-1, keepdims=True) / h
    rc = r - mean
    var = jnp.sum(rc * rc, axis=-1, keepdims=True) / h
    rs = jax.lax.rsqrt(var + eps)
    return (rc * rs) * gamma + beta


def _ln_bwd_f32(dz, r, gamma, eps: float):
    """Returns (dr, dgamma, dbeta), all f32; stats recomputed from r."""
    h = r.shape[-1]
    mean = jnp.sum(r, axis=-1, keepdims=True) / h
    rc = r - mean
    var = jnp.sum(rc * rc, axis=-1, keepdims=True) / h
    rs = jax.lax.rsqrt(var + eps)
    xhat = rc * rs
    dgamma = jnp.sum(dz * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dz, axis=0, keepdims=True)
    dxhat = dz * gamma
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / h
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / h
    dr = rs * (dxhat - m1 - xhat * m2)
    return dr, dgamma, dbeta


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _ffn_bits(bits_ref, seed_ref, shape, rate: float, use_prng: bool):
    """Dropout bits for the FFN site: host array or in-kernel Mosaic PRNG.
    `use_prng`/`rate` are static, so the unused path never traces (the
    Mosaic PRNG has no CPU/interpret lowering)."""
    if rate <= 0.0:
        return None
    if use_prng:
        pltpu.prng_seed(seed_ref[0, 0])
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits_ref[:]


def _attn_bits(bitsp_ref, bitsh_ref, seed_ref, pshape, hshape,
               rate: float, use_prng: bool):
    """Bits for BOTH attention sites, generated in a FIXED order so the
    backward (same seed) regenerates identical masks."""
    if rate <= 0.0:
        return None, None
    if use_prng:
        pltpu.prng_seed(seed_ref[0, 0])
        bp = pltpu.bitcast(pltpu.prng_random_bits(pshape), jnp.uint32)
        bh = pltpu.bitcast(pltpu.prng_random_bits(hshape), jnp.uint32)
        return bp, bh
    # host mode: bp is only ever head-sliced (works on the ref directly);
    # bh is consumed whole, so materialize it
    return bitsp_ref, bitsh_ref[:]


# ---------------------------------------------------------------------------
# FFN half-layer: z = LN(x + drop(W2 gelu(W1 x + c1) + c2))
# ---------------------------------------------------------------------------


def _ffn_fwd_kernel(x_ref, w1_ref, c1_ref, w2_ref, c2_ref, g_ref, b_ref,
                    bits_ref, seed_ref, z_ref, f_ref, r_ref, zacc_ref, *,
                    rate: float, eps: float, use_prng: bool):
    """K-streamed forward: grid over the intermediate dim. Each step
    consumes one (H, BI) column block of w1 and the matching (BI, H) row
    block of w2 (Mosaic double-buffers the block DMA against compute —
    a gridless kernel pays the full weight-DMA latency serially), and
    accumulates the second GEMM into an f32 scratch; the dropout +
    residual + LN epilogue runs on the last step."""
    dt = x_ref.dtype
    j = pl.program_id(0)
    last = pl.num_programs(0) - 1
    x = x_ref[:]
    f32 = jnp.dot(x, w1_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    f = f32.astype(dt) + c1_ref[:].astype(dt)           # (R, BI)
    f_ref[:] = f
    a = _gelu(_f32(f)).astype(dt)
    part = jnp.dot(a, w2_ref[:].astype(dt),
                   preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        zacc_ref[:] = part

    @pl.when(j > 0)
    def _():
        zacc_ref[:] += part

    @pl.when(j == last)
    def _():
        bits = _ffn_bits(bits_ref, seed_ref, x.shape, rate, use_prng)
        g = zacc_ref[:].astype(dt) + c2_ref[:].astype(dt)
        if rate > 0.0:
            g = _drop(g, bits, rate, dt)
        r = x + g
        r_ref[:] = r
        z = _ln_fwd_f32(_f32(r), _f32(g_ref[:].astype(dt)),
                        _f32(b_ref[:].astype(dt)), eps)
        z_ref[:] = z.astype(dt)


def _ffn_bwd_kernel(dz_ref, x_ref, f_ref, r_ref, w1_ref, w2_ref, g_ref,
                    bits_ref, seed_ref, dx_ref, dw1_ref, dc1_ref, dw2_ref,
                    dc2_ref, dg_ref, db_ref, dgg_ref, dr_ref, dxacc_ref, *,
                    rate: float, eps: float, use_prng: bool):
    """K-streamed backward: LN/dropout prologue once (step 0), then per
    intermediate-dim block: dW2, da, df, dW1, dc1 and the dx
    accumulation — all block weight/residual DMA pipelined by the grid."""
    dt = dz_ref.dtype
    j = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(j == 0)
    def _():
        bits = _ffn_bits(bits_ref, seed_ref, dz_ref.shape, rate, use_prng)
        dr32, dgamma, dbeta = _ln_bwd_f32(_f32(dz_ref[:]), _f32(r_ref[:]),
                                          _f32(g_ref[:].astype(dt)), eps)
        dg_ref[:] = dgamma.astype(dg_ref.dtype)
        db_ref[:] = dbeta.astype(db_ref.dtype)
        dr = dr32.astype(dt)
        dr_ref[:] = dr
        dgg = dr
        if rate > 0.0:
            dgg = _drop(dr, bits, rate, dt)
        dgg_ref[:] = dgg
        dc2_ref[:] = jnp.sum(_f32(dgg), axis=0, keepdims=True).astype(
            dc2_ref.dtype)

    dgg = dgg_ref[:]
    f = f_ref[:]                                        # (R, BI)
    a = _gelu(_f32(f)).astype(dt)
    w1 = w1_ref[:].astype(dt)                           # (H, BI)
    w2 = w2_ref[:].astype(dt)                           # (BI, H)
    dw2_ref[:] = jax.lax.dot_general(
        a, dgg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw2_ref.dtype)
    da = jax.lax.dot_general(
        dgg, w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)  # (R, BI)
    df = (_f32(da) * _dgelu(_f32(f))).astype(dt)
    x = x_ref[:]
    dw1_ref[:] = jax.lax.dot_general(
        x, df, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw1_ref.dtype)
    dc1_ref[:] = jnp.sum(_f32(df), axis=0, keepdims=True).astype(
        dc1_ref.dtype)
    dx = jax.lax.dot_general(
        df, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (R, H) f32

    @pl.when(j == 0)
    def _():
        dxacc_ref[:] = dx

    @pl.when(j > 0)
    def _():
        dxacc_ref[:] += dx

    @pl.when(j == last)
    def _():
        dx_ref[:] = dr_ref[:] + dxacc_ref[:].astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def ffn_block(x, w1, c1, w2, c2, gamma, beta, bits, seed,
              rate: float = 0.0, eps: float = 1e-12,
              use_prng: bool = False, interpret: bool = False):
    """Fused post-LN FFN half-layer.

    x: (R, H) caller dtype. w1: (H, I), c1: (I,), w2: (I, H), c2: (H,),
    gamma/beta: (H,) — FP32 MASTERS, cast to the caller dtype inside the
    kernel (same rounding as flax's per-use cast; grads come back in the
    master dtype with no boundary converts). Dropout: either host bits
    (`use_prng=False`, bits: (R, H) uint32) or the in-kernel Mosaic PRNG
    (`use_prng=True`, seed: (1, 1) int32). Pass dummies for the unused
    mode / when rate == 0. Returns z: (R, H).
    """
    z, _ = _ffn_fwd(x, w1, c1, w2, c2, gamma, beta, bits, seed, rate, eps,
                    use_prng, interpret)
    return z


def _ffn_cols(i: int) -> int:
    """Largest lane-aligned divisor of the intermediate dim <= 768: the
    streamed column-block width (3072 -> 768 = 4 grid steps)."""
    for bi in (768, 512, 384, 256, 128):
        if i % bi == 0:
            return bi
    return i


def _ffn_fwd(x, w1, c1, w2, c2, gamma, beta, bits, seed, rate, eps,
             use_prng, interpret):
    n, h = x.shape
    i = w1.shape[1]
    bi = _ffn_cols(i)
    const = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda j: (0, 0),
                        memory_space=pltpu.SMEM)
    z, f, r = pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, rate=rate, eps=eps,
                          use_prng=use_prng),
        grid=(i // bi,),
        in_specs=[
            const((n, h)),                                        # x
            pl.BlockSpec((h, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # w1
            pl.BlockSpec((1, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # c1
            pl.BlockSpec((bi, h), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),                # w2
            const((1, h)),                                        # c2
            const((1, h)),                                        # gamma
            const((1, h)),                                        # beta
            const(bits.shape),                                    # bits
            smem,                                                 # seed
        ],
        out_specs=[
            const((n, h)),                                        # z
            pl.BlockSpec((n, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # f
            const((n, h)),                                        # r
        ],
        out_shape=[jax.ShapeDtypeStruct((n, h), x.dtype),
                   jax.ShapeDtypeStruct((n, i), x.dtype),
                   jax.ShapeDtypeStruct((n, h), x.dtype)],
        scratch_shapes=[pltpu.VMEM((n, h), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(x, w1, c1.reshape(1, i), w2, c2.reshape(1, h), gamma.reshape(1, h),
      beta.reshape(1, h), bits, seed)
    return z, (x, f, r, w1, w2, gamma, bits, seed)


def _ffn_bwd(rate, eps, use_prng, interpret, res, dz):
    x, f, r, w1, w2, gamma, bits, seed = res
    n, h = x.shape
    i = w1.shape[1]
    bi = _ffn_cols(i)
    const = lambda shape: pl.BlockSpec(shape, lambda j: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda j: (0, 0),
                        memory_space=pltpu.SMEM)
    dx, dw1, dc1, dw2, dc2, dg, db = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, rate=rate, eps=eps,
                          use_prng=use_prng),
        grid=(i // bi,),
        in_specs=[
            const((n, h)),                                        # dz
            const((n, h)),                                        # x
            pl.BlockSpec((n, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # f
            const((n, h)),                                        # r
            pl.BlockSpec((h, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # w1
            pl.BlockSpec((bi, h), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),                # w2
            const((1, h)),                                        # gamma
            const(bits.shape),                                    # bits
            smem,                                                 # seed
        ],
        out_specs=[
            const((n, h)),                                        # dx
            pl.BlockSpec((h, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # dw1
            pl.BlockSpec((1, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),                # dc1
            pl.BlockSpec((bi, h), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),                # dw2
            const((1, h)),                                        # dc2
            const((1, h)),                                        # dg
            const((1, h)),                                        # db
        ],
        out_shape=[jax.ShapeDtypeStruct((n, h), x.dtype),
                   jax.ShapeDtypeStruct((h, i), w1.dtype),
                   jax.ShapeDtypeStruct((1, i), w1.dtype),
                   jax.ShapeDtypeStruct((i, h), w2.dtype),
                   jax.ShapeDtypeStruct((1, h), w2.dtype),
                   jax.ShapeDtypeStruct((1, h), gamma.dtype),
                   jax.ShapeDtypeStruct((1, h), gamma.dtype)],
        scratch_shapes=[pltpu.VMEM((n, h), x.dtype),       # dgg
                        pltpu.VMEM((n, h), x.dtype),       # dr
                        pltpu.VMEM((n, h), jnp.float32)],  # dxacc
        compiler_params=_params(),
        interpret=interpret,
    )(dz, x, f, r, w1, w2, gamma.reshape(1, h), bits, seed)
    return (dx, dw1, dc1.reshape(i), dw2, dc2.reshape(h),
            dg.reshape(h), db.reshape(h), _float0_like(bits),
            _float0_like(seed))


ffn_block.defvjp(_ffn_fwd, _ffn_bwd)


# ---------------------------------------------------------------------------
# Attention half-layer: y = LN(x + drop(Wo MHSA(x) + bo))
# ---------------------------------------------------------------------------


def _attn_heads_fwd(x, wqkv, bqkv, mask, bits_p, b: int, t: int,
                    heads: int, rate: float, dt):
    """Shared fwd attention math: returns (qkv, p_all, o2) in caller dtype.

    p_all: (heads*B, T, T) probs AFTER the dtype rounding, BEFORE dropout.
    o2: (R, H) context rows (after prob-dropout, pre-Wo).
    """
    h = x.shape[1]
    d = h // heads
    inv = 1.0 / float(np.sqrt(d))
    qkv32 = jnp.dot(x, wqkv, preferred_element_type=jnp.float32)
    qkv = qkv32.astype(dt) + bqkv                       # (R, 3H)
    q3 = qkv[:, :h].reshape(b, t, h)
    k3 = qkv[:, h:2 * h].reshape(b, t, h)
    v3 = qkv[:, 2 * h:].reshape(b, t, h)
    neg = jnp.finfo(jnp.float32).min
    # (B, T, T) additive key mask, same every head/query row
    mbias = jnp.where(jnp.broadcast_to(mask[:, None, :] > 0, (b, t, t)),
                      jnp.float32(0), neg)
    ps, os = [], []
    for hd in range(heads):
        sl = slice(hd * d, (hd + 1) * d)
        s = jax.lax.dot_general(q3[:, :, sl], k3[:, :, sl],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * inv + mbias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ps.append(p)
        pd = p
        if rate > 0.0:
            pd = _drop(p, bits_p[hd * b:(hd + 1) * b], rate, dt)
        o = jax.lax.dot_general(pd, v3[:, :, sl],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        os.append(o.astype(dt))
    p_all = jnp.concatenate(ps, axis=0)                 # (heads*B, T, T)
    o2 = jnp.concatenate(os, axis=-1).reshape(b * t, h)  # (R, H)
    return qkv, p_all, o2


def _attn_heads_bwd(do2, qkv, p_all, bp, b: int, t: int, heads: int,
                    rate: float, dt):
    """Shared per-head attention backward: given do2 = d(context rows)
    (R, H), returns dqkv (R, 3H). `p_all` / `bp` may be refs or arrays
    (only ever head-sliced)."""
    n, h3 = qkv.shape
    h = h3 // 3
    d = h // heads
    inv = 1.0 / float(np.sqrt(d))
    do3 = do2.reshape(b, t, h)
    q3 = qkv[:, :h].reshape(b, t, h)
    k3 = qkv[:, h:2 * h].reshape(b, t, h)
    v3 = qkv[:, 2 * h:].reshape(b, t, h)
    dqs, dks, dvs = [], [], []
    for hd in range(heads):
        sl = slice(hd * d, (hd + 1) * d)
        p = p_all[hd * b:(hd + 1) * b]                   # (B, T, T) dtype dt
        pd = p
        if rate > 0.0:
            pd = _drop(p, bp[hd * b:(hd + 1) * b], rate, dt)
        doh = do3[:, :, sl]                              # (B, T, d)
        # dv = pd^T do  (contract over query axis, batched over B)
        dv = jax.lax.dot_general(pd, doh, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dvs.append(dv.astype(dt))
        # dp = do v^T (batched)
        dp = jax.lax.dot_general(doh, v3[:, :, sl],
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = _drop(dp, bp[hd * b:(hd + 1) * b], rate, jnp.float32)
        p32 = _f32(p)
        ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
        ds = (ds * inv).astype(dt)
        # dq = ds k (batched over B), dk = ds^T q
        dq = jax.lax.dot_general(ds, k3[:, :, sl],
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q3[:, :, sl],
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dt))
        dks.append(dk.astype(dt))
    dq2 = jnp.concatenate(dqs, axis=-1).reshape(b * t, h)
    dk2 = jnp.concatenate(dks, axis=-1).reshape(b * t, h)
    dv2 = jnp.concatenate(dvs, axis=-1).reshape(b * t, h)
    return jnp.concatenate([dq2, dk2, dv2], axis=-1)     # (R, 3H)


def _attn_fwd_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                     g_ref, b_ref, bitsp_ref, bitsh_ref, seed_ref,
                     y_ref, qkv_ref, p_ref, o_ref, r_ref, *,
                     b: int, t: int, heads: int, rate: float, eps: float,
                     use_prng: bool):
    dt = x_ref.dtype
    x = x_ref[:]
    n, h = x.shape
    bp, bh = _attn_bits(bitsp_ref, bitsh_ref, seed_ref,
                        (heads * b, t, t), (n, h), rate, use_prng)
    qkv, p_all, o2 = _attn_heads_fwd(x, wqkv_ref[:].astype(dt),
                                     bqkv_ref[:].astype(dt),
                                     mask_ref[:], bp, b, t, heads,
                                     rate, dt)
    qkv_ref[:] = qkv
    p_ref[:] = p_all
    o_ref[:] = o2
    h32 = jnp.dot(o2, wo_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    hh = h32.astype(dt) + bo_ref[:].astype(dt)
    if rate > 0.0:
        hh = _drop(hh, bh, rate, dt)
    r = x + hh
    r_ref[:] = r
    y = _ln_fwd_f32(_f32(r), _f32(g_ref[:].astype(dt)),
                    _f32(b_ref[:].astype(dt)), eps)
    y_ref[:] = y.astype(dt)


def _attn_bwd_kernel(dy_ref, x_ref, qkv_ref, p_ref, o_ref, r_ref,
                     wqkv_ref, wo_ref, g_ref, bitsp_ref, bitsh_ref,
                     seed_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref,
                     dbo_ref, dg_ref, db_ref, *,
                     b: int, t: int, heads: int, rate: float, eps: float,
                     use_prng: bool):
    dt = dy_ref.dtype
    n, h = x_ref.shape
    d = h // heads
    inv = 1.0 / float(np.sqrt(d))
    bp, bh = _attn_bits(bitsp_ref, bitsh_ref, seed_ref,
                        (heads * b, t, t), (n, h), rate, use_prng)
    dr32, dgamma, dbeta = _ln_bwd_f32(_f32(dy_ref[:]), _f32(r_ref[:]),
                                      _f32(g_ref[:].astype(dt)), eps)
    dg_ref[:] = dgamma.astype(dg_ref.dtype)
    db_ref[:] = dbeta.astype(db_ref.dtype)
    dr = dr32.astype(dt)
    dh = dr
    if rate > 0.0:
        dh = _drop(dr, bh, rate, dt)
    o2 = o_ref[:]
    dwo_ref[:] = jax.lax.dot_general(
        o2, dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwo_ref.dtype)
    dbo_ref[:] = jnp.sum(_f32(dh), axis=0, keepdims=True).astype(
        dbo_ref.dtype)
    do2 = jax.lax.dot_general(
        dh, wo_ref[:].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)   # (R, H)
    dqkv = _attn_heads_bwd(do2, qkv_ref[:], p_ref, bp, b, t, heads,
                           rate, dt)
    x = x_ref[:]
    dwqkv_ref[:] = jax.lax.dot_general(
        x, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwqkv_ref.dtype)
    dbqkv_ref[:] = jnp.sum(_f32(dqkv), axis=0, keepdims=True).astype(
        dbqkv_ref.dtype)
    dx = jax.lax.dot_general(
        dqkv, wqkv_ref[:].astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    dx_ref[:] = dr + dx


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16, 17))
def attn_block(x, mask, wqkv, bqkv, wo, bo, gamma, beta, bits_p, bits_h,
               seed, b: int = 0, t: int = 0, heads: int = 12,
               rate: float = 0.0, eps: float = 1e-12,
               use_prng: bool = False, interpret: bool = False):
    """Fused post-LN self-attention half-layer.

    x: (R, H) = (b*t, H) caller dtype; mask: (b, t) int32 (nonzero = valid
    key); wqkv: (H, 3H) [q|k|v] packed like models/text_bert (convert.py
    packs HF weights the same way); wo: (H, H); gamma/beta: (H,) —
    weights/LN params are FP32 MASTERS, cast inside the kernel. Dropout:
    host bits (`use_prng=False`: bits_p (heads*b, t, t), bits_h (R, H)
    uint32) or the in-kernel Mosaic PRNG (`use_prng=True`, seed (1, 1)
    int32); pass dummies for the unused mode / rate == 0.
    Returns y: (R, H).
    """
    y, _ = _attn_fwd(x, mask, wqkv, bqkv, wo, bo, gamma, beta, bits_p,
                     bits_h, seed, b, t, heads, rate, eps, use_prng,
                     interpret)
    return y


def _attn_fwd(x, mask, wqkv, bqkv, wo, bo, gamma, beta, bits_p, bits_h,
              seed, b, t, heads, rate, eps, use_prng, interpret):
    n, h = x.shape
    assert n == b * t, (n, b, t)
    full = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    y, qkv, p, o, r = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, b=b, t=t, heads=heads,
                          rate=rate, eps=eps, use_prng=use_prng),
        in_specs=[full()] * 10 + [smem],
        out_specs=[full()] * 5,
        out_shape=[jax.ShapeDtypeStruct((n, h), x.dtype),
                   jax.ShapeDtypeStruct((n, 3 * h), x.dtype),
                   jax.ShapeDtypeStruct((heads * b, t, t), x.dtype),
                   jax.ShapeDtypeStruct((n, h), x.dtype),
                   jax.ShapeDtypeStruct((n, h), x.dtype)],
        compiler_params=_params(),
        interpret=interpret,
    )(x, mask, wqkv, bqkv.reshape(1, 3 * h), wo, bo.reshape(1, h),
      gamma.reshape(1, h), beta.reshape(1, h), bits_p, bits_h, seed)
    return y, (x, mask, qkv, p, o, r, wqkv, wo, gamma, bits_p, bits_h,
               seed)


def _attn_bwd(b, t, heads, rate, eps, use_prng, interpret, res, dy):
    x, mask, qkv, p, o, r, wqkv, wo, gamma, bits_p, bits_h, seed = res
    n, h = x.shape
    full = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    dx, dwqkv, dbqkv, dwo, dbo, dg, db = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, b=b, t=t, heads=heads,
                          rate=rate, eps=eps, use_prng=use_prng),
        in_specs=[full()] * 11 + [smem],
        out_specs=[full()] * 7,
        out_shape=[jax.ShapeDtypeStruct((n, h), x.dtype),
                   jax.ShapeDtypeStruct((h, 3 * h), wqkv.dtype),
                   jax.ShapeDtypeStruct((1, 3 * h), wqkv.dtype),
                   jax.ShapeDtypeStruct((h, h), wo.dtype),
                   jax.ShapeDtypeStruct((1, h), wo.dtype),
                   jax.ShapeDtypeStruct((1, h), gamma.dtype),
                   jax.ShapeDtypeStruct((1, h), gamma.dtype)],
        compiler_params=_params(),
        interpret=interpret,
    )(dy, x, qkv, p, o, r, wqkv, wo, gamma.reshape(1, h), bits_p, bits_h,
      seed)
    return (dx, _float0_like(mask), dwqkv, dbqkv.reshape(3 * h), dwo,
            dbo.reshape(h), dg.reshape(h), db.reshape(h),
            _float0_like(bits_p), _float0_like(bits_h),
            _float0_like(seed))


attn_block.defvjp(_attn_fwd, _attn_bwd)


# ---------------------------------------------------------------------------
# Whole-tower megakernel: all L post-LN layers in ONE kernel each way.
#
# Grid = (L,). Per grid step the kernel runs one complete layer
# (attention half + FFN half) on the carried activation; per-layer weights
# arrive as (1, ...) blocks of stacked (L, ...) arrays, so Mosaic
# double-buffers layer j+1's weight DMA against layer j's compute, and the
# per-layer residuals stream OUT the same way. This collapses the tower
# from 48 kernel crossings (fused_block="both") / ~600 XLA ops to exactly
# one custom-call forward and one backward, removing the per-boundary
# copy/launch tax the half-layer A/B measured.
#
# The backward iterates layers in REVERSE via the BlockSpec index maps
# (the kernel body always sees "its" layer at block index 0) and carries
# d(activation) in scratch. Dropout bits regenerate per layer from
# prng_seed(seed + layer), so fwd and bwd agree regardless of iteration
# order; host-bits mode takes stacked (L, ...) bit arrays (fused_dropout
# plan / CPU interpret tests).
# ---------------------------------------------------------------------------


def _tower_fwd_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                      g1_ref, b1_ref, w1_ref, c1_ref, w2_ref, c2_ref,
                      g2_ref, b2_ref, bitsp_ref, bitsh_ref, bitsf_ref,
                      seed_ref, z_ref, xin_ref, qkv_ref, p_ref, o_ref,
                      r1_ref, f_ref, r2_ref, xc, *,
                      b: int, t: int, heads: int, rate: float, eps: float,
                      use_prng: bool):
    dt = x_ref.dtype
    j = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(j == 0)
    def _():
        xc[:] = x_ref[:]

    x = xc[:]
    n, h = x.shape
    xin_ref[0] = x
    bp = bh = bf = None
    if rate > 0.0:
        if use_prng:
            pltpu.prng_seed(seed_ref[0, 0] + j)
            bp = pltpu.bitcast(
                pltpu.prng_random_bits((heads * b, t, t)), jnp.uint32)
            bh = pltpu.bitcast(
                pltpu.prng_random_bits((n, h)), jnp.uint32)
            bf = pltpu.bitcast(
                pltpu.prng_random_bits((n, h)), jnp.uint32)
        else:
            bp, bh, bf = bitsp_ref[0], bitsh_ref[0], bitsf_ref[0]

    # ---- attention half
    qkv, p_all, o2 = _attn_heads_fwd(x, wqkv_ref[0], bqkv_ref[0],
                                     mask_ref[:], bp, b, t, heads,
                                     rate, dt)
    qkv_ref[0] = qkv
    p_ref[0] = p_all
    o_ref[0] = o2
    hh = jnp.dot(o2, wo_ref[0],
                 preferred_element_type=jnp.float32).astype(dt) + bo_ref[0]
    if rate > 0.0:
        hh = _drop(hh, bh, rate, dt)
    r1 = x + hh
    r1_ref[0] = r1
    y = _ln_fwd_f32(_f32(r1), _f32(g1_ref[0]), _f32(b1_ref[0]),
                    eps).astype(dt)

    # ---- FFN half
    f = jnp.dot(y, w1_ref[0],
                preferred_element_type=jnp.float32).astype(dt) + c1_ref[0]
    f_ref[0] = f
    a = _gelu(_f32(f)).astype(dt)
    g = jnp.dot(a, w2_ref[0],
                preferred_element_type=jnp.float32).astype(dt) + c2_ref[0]
    if rate > 0.0:
        g = _drop(g, bf, rate, dt)
    r2 = y + g
    r2_ref[0] = r2
    z = _ln_fwd_f32(_f32(r2), _f32(g2_ref[0]), _f32(b2_ref[0]),
                    eps).astype(dt)
    xc[:] = z

    @pl.when(j == last)
    def _():
        z_ref[:] = xc[:]


def _tower_bwd_kernel(dz_ref, mask_ref, xin_ref, qkv_ref, p_ref, o_ref,
                      r1_ref, f_ref, r2_ref, wqkv_ref, wo_ref, g1_ref,
                      b1_ref, w1_ref, w2_ref, g2_ref, bitsp_ref, bitsh_ref,
                      bitsf_ref, seed_ref,
                      dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                      dg1_ref, db1_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref,
                      dg2_ref, db2_ref, dyc, *,
                      n_layers: int, b: int, t: int, heads: int,
                      rate: float, eps: float, use_prng: bool):
    dt = dz_ref.dtype
    j = pl.program_id(0)
    last = pl.num_programs(0) - 1
    layer = n_layers - 1 - j                # the layer this step handles

    @pl.when(j == 0)
    def _():
        dyc[:] = dz_ref[:]

    dz = dyc[:]
    n, h = dz.shape
    bp = bh = bf = None
    if rate > 0.0:
        if use_prng:
            pltpu.prng_seed(seed_ref[0, 0] + layer)
            bp = pltpu.bitcast(
                pltpu.prng_random_bits((heads * b, t, t)), jnp.uint32)
            bh = pltpu.bitcast(
                pltpu.prng_random_bits((n, h)), jnp.uint32)
            bf = pltpu.bitcast(
                pltpu.prng_random_bits((n, h)), jnp.uint32)
        else:
            bp, bh, bf = bitsp_ref[0], bitsh_ref[0], bitsf_ref[0]

    # ---- FFN half backward (LN2 -> W2 -> gelu -> W1 -> LN1 input y)
    dr232, dg2, db2 = _ln_bwd_f32(_f32(dz), _f32(r2_ref[0]),
                                  _f32(g2_ref[0]), eps)
    dg2_ref[0] = dg2.astype(dg2_ref.dtype)
    db2_ref[0] = db2.astype(db2_ref.dtype)
    dr2 = dr232.astype(dt)
    dgg = dr2
    if rate > 0.0:
        dgg = _drop(dr2, bf, rate, dt)
    f = f_ref[0]
    a = _gelu(_f32(f)).astype(dt)
    w1 = w1_ref[0]
    w2 = w2_ref[0]
    dw2_ref[0] = jax.lax.dot_general(
        a, dgg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw2_ref.dtype)
    dc2_ref[0] = jnp.sum(_f32(dgg), axis=0, keepdims=True).astype(
        dc2_ref.dtype)
    da = jax.lax.dot_general(
        dgg, w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    df = (_f32(da) * _dgelu(_f32(f))).astype(dt)
    # y (the FFN input) is recomputed from the saved pre-LN1 residual
    y = _ln_fwd_f32(_f32(r1_ref[0]), _f32(g1_ref[0]), _f32(b1_ref[0]),
                    eps).astype(dt)
    dw1_ref[0] = jax.lax.dot_general(
        y, df, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw1_ref.dtype)
    dc1_ref[0] = jnp.sum(_f32(df), axis=0, keepdims=True).astype(
        dc1_ref.dtype)
    dy = dr2 + jax.lax.dot_general(
        df, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)

    # ---- attention half backward
    dr132, dg1, db1 = _ln_bwd_f32(_f32(dy), _f32(r1_ref[0]),
                                  _f32(g1_ref[0]), eps)
    dg1_ref[0] = dg1.astype(dg1_ref.dtype)
    db1_ref[0] = db1.astype(db1_ref.dtype)
    dr1 = dr132.astype(dt)
    dh = dr1
    if rate > 0.0:
        dh = _drop(dr1, bh, rate, dt)
    o2 = o_ref[0]
    dwo_ref[0] = jax.lax.dot_general(
        o2, dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwo_ref.dtype)
    dbo_ref[0] = jnp.sum(_f32(dh), axis=0, keepdims=True).astype(
        dbo_ref.dtype)
    do2 = jax.lax.dot_general(
        dh, wo_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    dqkv = _attn_heads_bwd(do2, qkv_ref[0], p_ref[0], bp, b, t, heads,
                           rate, dt)
    x = xin_ref[0]
    dwqkv_ref[0] = jax.lax.dot_general(
        x, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwqkv_ref.dtype)
    dbqkv_ref[0] = jnp.sum(_f32(dqkv), axis=0, keepdims=True).astype(
        dbqkv_ref.dtype)
    dx = dr1 + jax.lax.dot_general(
        dqkv, wqkv_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    dyc[:] = dx

    @pl.when(j == last)
    def _():
        dx_ref[:] = dyc[:]


_TOWER_VMEM = 127 * 1024 * 1024


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(18, 19, 20, 21, 22, 23, 24))
def tower_block(x, mask, wqkv_s, bqkv_s, wo_s, bo_s, g1_s, b1_s,
                w1_s, c1_s, w2_s, c2_s, g2_s, b2_s,
                bits_p, bits_h, bits_f, seed,
                b: int = 0, t: int = 0, heads: int = 12,
                rate: float = 0.0, eps: float = 1e-12,
                use_prng: bool = False, interpret: bool = False):
    """Whole post-LN tower as ONE fwd + ONE bwd Pallas kernel.

    x: (R, H) = (b*t, H) caller dtype. Stacked per-layer params, ALREADY
    cast to the caller dtype (the model stacks+casts once per step; the
    cast/stack VJPs restore per-leaf fp32 grads): wqkv_s (L, H, 3H),
    bqkv_s (L, 1, 3H), wo_s (L, H, H), bo_s (L, 1, H), g1_s/b1_s
    (L, 1, H), w1_s (L, H, I), c1_s (L, 1, I), w2_s (L, I, H), c2_s
    (L, 1, H), g2_s/b2_s (L, 1, H). Dropout: in-kernel Mosaic PRNG
    (`use_prng=True`, seed (1,1) int32, per-layer reseed) or stacked host
    bits (L, heads*b, t, t) / (L, R, H) x2. Returns z: (R, H).
    """
    z, _ = _tower_fwd(x, mask, wqkv_s, bqkv_s, wo_s, bo_s, g1_s, b1_s,
                      w1_s, c1_s, w2_s, c2_s, g2_s, b2_s, bits_p, bits_h,
                      bits_f, seed, b, t, heads, rate, eps, use_prng,
                      interpret)
    return z


def _stk(shape):
    """(1, ...) block of a layer-stacked array, forward layer order."""
    nd = len(shape)
    return pl.BlockSpec((1,) + tuple(shape),
                        lambda j: (j,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


def _stk_rev(shape, n_layers):
    """(1, ...) block of a layer-stacked array, REVERSED layer order."""
    nd = len(shape)
    return pl.BlockSpec((1,) + tuple(shape),
                        lambda j: (n_layers - 1 - j,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


def _tower_fwd(x, mask, wqkv_s, bqkv_s, wo_s, bo_s, g1_s, b1_s,
               w1_s, c1_s, w2_s, c2_s, g2_s, b2_s, bits_p, bits_h,
               bits_f, seed, b, t, heads, rate, eps, use_prng, interpret):
    n, h = x.shape
    L = wqkv_s.shape[0]
    i = w1_s.shape[2]
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    host_bits = rate > 0.0 and not use_prng
    bspec = (lambda a: _stk(a.shape[1:])) if host_bits else \
        (lambda a: const(a.shape))
    z, xin, qkv, p, o, r1, f, r2 = pl.pallas_call(
        functools.partial(_tower_fwd_kernel, b=b, t=t, heads=heads,
                          rate=rate, eps=eps, use_prng=use_prng),
        grid=(L,),
        in_specs=[
            const((n, h)), const(mask.shape),
            _stk((h, 3 * h)), _stk((1, 3 * h)), _stk((h, h)),
            _stk((1, h)), _stk((1, h)), _stk((1, h)),
            _stk((h, i)), _stk((1, i)), _stk((i, h)),
            _stk((1, h)), _stk((1, h)), _stk((1, h)),
            bspec(bits_p), bspec(bits_h), bspec(bits_f), smem,
        ],
        out_specs=[
            const((n, h)),
            _stk((n, h)), _stk((n, 3 * h)), _stk((heads * b, t, t)),
            _stk((n, h)), _stk((n, h)), _stk((n, i)), _stk((n, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((L, n, h), x.dtype),
            jax.ShapeDtypeStruct((L, n, 3 * h), x.dtype),
            jax.ShapeDtypeStruct((L, heads * b, t, t), x.dtype),
            jax.ShapeDtypeStruct((L, n, h), x.dtype),
            jax.ShapeDtypeStruct((L, n, h), x.dtype),
            jax.ShapeDtypeStruct((L, n, i), x.dtype),
            jax.ShapeDtypeStruct((L, n, h), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, h), x.dtype)],
        compiler_params=_params(vmem_limit_bytes=_TOWER_VMEM),
        interpret=interpret,
    )(x, mask, wqkv_s, bqkv_s, wo_s, bo_s, g1_s, b1_s, w1_s, c1_s, w2_s,
      c2_s, g2_s, b2_s, bits_p, bits_h, bits_f, seed)
    return z, (x, mask, wqkv_s, wo_s, g1_s, b1_s, w1_s, w2_s, g2_s,
               bits_p, bits_h, bits_f, seed, xin, qkv, p, o, r1, f, r2)


def _tower_bwd(b, t, heads, rate, eps, use_prng, interpret, res, dz):
    (x, mask, wqkv_s, wo_s, g1_s, b1_s, w1_s, w2_s, g2_s,
     bits_p, bits_h, bits_f, seed, xin, qkv, p, o, r1, f, r2) = res
    n, h = x.shape
    L = wqkv_s.shape[0]
    i = w1_s.shape[2]
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    rev = functools.partial(_stk_rev, n_layers=L)
    host_bits = rate > 0.0 and not use_prng
    bspec = (lambda a: rev(a.shape[1:])) if host_bits else \
        (lambda a: const(a.shape))
    (dx, dwqkv, dbqkv, dwo, dbo, dg1, db1, dw1, dc1, dw2, dc2, dg2,
     db2) = pl.pallas_call(
        functools.partial(_tower_bwd_kernel, n_layers=L, b=b, t=t,
                          heads=heads, rate=rate, eps=eps,
                          use_prng=use_prng),
        grid=(L,),
        in_specs=[
            const((n, h)), const(mask.shape),
            rev((n, h)), rev((n, 3 * h)), rev((heads * b, t, t)),
            rev((n, h)), rev((n, h)), rev((n, i)), rev((n, h)),
            rev((h, 3 * h)), rev((h, h)), rev((1, h)), rev((1, h)),
            rev((h, i)), rev((i, h)), rev((1, h)),
            bspec(bits_p), bspec(bits_h), bspec(bits_f), smem,
        ],
        out_specs=[
            const((n, h)),
            rev((h, 3 * h)), rev((1, 3 * h)), rev((h, h)), rev((1, h)),
            rev((1, h)), rev((1, h)), rev((h, i)), rev((1, i)),
            rev((i, h)), rev((1, h)), rev((1, h)), rev((1, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((L, h, 3 * h), wqkv_s.dtype),
            jax.ShapeDtypeStruct((L, 1, 3 * h), wqkv_s.dtype),
            jax.ShapeDtypeStruct((L, h, h), wo_s.dtype),
            jax.ShapeDtypeStruct((L, 1, h), wo_s.dtype),
            jax.ShapeDtypeStruct((L, 1, h), g1_s.dtype),
            jax.ShapeDtypeStruct((L, 1, h), g1_s.dtype),
            jax.ShapeDtypeStruct((L, h, i), w1_s.dtype),
            jax.ShapeDtypeStruct((L, 1, i), w1_s.dtype),
            jax.ShapeDtypeStruct((L, i, h), w2_s.dtype),
            jax.ShapeDtypeStruct((L, 1, h), w2_s.dtype),
            jax.ShapeDtypeStruct((L, 1, h), g2_s.dtype),
            jax.ShapeDtypeStruct((L, 1, h), g2_s.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, h), x.dtype)],
        compiler_params=_params(vmem_limit_bytes=_TOWER_VMEM),
        interpret=interpret,
    )(dz, mask, xin, qkv, p, o, r1, f, r2, wqkv_s, wo_s, g1_s, b1_s,
      w1_s, w2_s, g2_s, bits_p, bits_h, bits_f, seed)
    return (dx, _float0_like(mask), dwqkv, dbqkv, dwo, dbo, dg1, db1,
            dw1, dc1, dw2, dc2, dg2, db2, _float0_like(bits_p),
            _float0_like(bits_h), _float0_like(bits_f),
            _float0_like(seed))


tower_block.defvjp(_tower_fwd, _tower_bwd)
