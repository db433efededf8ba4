"""Transformer text encoders + FCAM text head, flax-native.

The reference wraps HuggingFace *torch* text models selected by
`args.bert_type` in {bert, align, clip, blip, falva(sic), groupvit}
(reference: models/models.py:123-167) and always reads
`sent = last_hidden[:, 0]`, `words = last_hidden[:, 1:]`.

Here the encoder is implemented natively in flax as one configurable
transformer (`TransformerEncoder`) instantiated from a per-`bert_type`
architecture table matching the corresponding HF checkpoints (hidden sizes the
reference comments document: 768 for bert-family, 512 for clip, 256 for
groupvit). Pretrained HF torch weights, when present on disk, are converted by
engine/convert.py; otherwise encoders initialize randomly (this machine has no
network egress).

`TextHeading` (reference: models/models.py:170-232) maps per-token features to
the shared 256-d space via three token-window projections (K in {2,3,4}) — the
reference's Conv2d(1, 256, (K, 768)) stack — expressed as window-stacked GEMMs,
and re-assembles per-word features with a *vectorized* multi-scale max (the
reference loops over batch and sequence in Python with a hard-coded CUDA
tensor: models/models.py:197-213).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from text_guided_face_recognition_tpu.models.layers import l2_normalize

Dtype = Any

__all__ = ["TextArch", "TEXT_ARCHS", "TransformerEncoder", "TextEncoder",
           "BertWordMapping", "TextHeading", "FusedLayerNorm"]


class FusedLayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm backed by the single-kernel Pallas LN
    (ops/layernorm_pallas.py). Same param tree ('scale'/'bias', fp32) so
    checkpoints are interchangeable with nn.LayerNorm. Stats in fp32 (like
    nn.LayerNorm at fp32; nn.LayerNorm(dtype=bf16) keeps bf16 stats — the
    delta is below bf16 resolution, tests/test_fused_ln.py)."""

    epsilon: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from text_guided_face_recognition_tpu.ops.layernorm_pallas import (
            layernorm_fused)
        h = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (h,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (h,), jnp.float32)
        import jax as _jax
        interpret = _jax.default_backend() == "cpu"
        return layernorm_fused(x.astype(self.dtype), scale, bias,
                               float(self.epsilon), interpret)



class _DropPlan:
    """One-RNG-call dropout plan (config `fused_dropout`).

    The production step otherwise issues ~37 independent RNG+mask kernel
    groups (emb + 3 sites x 12 layers); this generates every site's random
    bits with ONE jax.random.bits call per step and hands each site a slice
    (static offsets), so XLA fuses slice+compare+select into the consumers.
    Mask VALUES carry no parity constraint (torch masks differ anyway) —
    only the keep-probability semantics, which are identical."""

    def __init__(self, bits, rate: float):
        self.bits = bits
        self.rate = float(rate)
        self.ofs = 0
        # keep iff bits >= threshold: P(keep) = 1 - rate exactly in u32 space
        self.threshold = jnp.uint32(min(int(round(rate * (1 << 32))),
                                        (1 << 32) - 1))

    @staticmethod
    def total_elems(a: "TextArch", b: int, t: int) -> int:
        per_layer = b * a.heads * t * t + 2 * b * t * a.hidden
        return b * t * a.hidden + a.layers * per_layer  # emb + layers

    def take(self, x: jnp.ndarray) -> jnp.ndarray:
        keep = (self.take_bits(x.shape) >= self.threshold)
        scale = 1.0 / (1.0 - self.rate)
        return jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                         jnp.zeros((), x.dtype))

    def take_bits(self, shape) -> jnp.ndarray:
        """Slice raw uint32 bits for a site (the fused-block kernels apply
        the threshold themselves with identical semantics)."""
        n = 1
        for s in shape:
            n *= int(s)
        sl = jax.lax.dynamic_slice_in_dim(self.bits, self.ofs, n)
        self.ofs += n
        return sl.reshape(shape)


def _ln(fused: bool, eps: float, dtype, name: str):
    if fused:
        return FusedLayerNorm(epsilon=eps, dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=eps, dtype=dtype, name=name)


@dataclasses.dataclass(frozen=True)
class TextArch:
    vocab_size: int
    hidden: int
    layers: int
    heads: int
    intermediate: int
    max_positions: int
    style: str = "postln"      # block layout: "postln" (BERT) | "preln" (CLIP/ViT)
    causal: bool = False
    act: str = "gelu"          # "gelu" (erf) | "quick_gelu"
    type_vocab: int = 2        # 0 disables token-type embeddings
    dropout: float = 0.1       # hidden/attention dropout (train mode only)
    emb_ln: bool = True        # LayerNorm over the summed embeddings
    final_ln: bool = False     # trailing LayerNorm after the last block
    ln_eps: float = 1e-12


# Architecture table for the HF checkpoints named in cfg/train_bert.yml:60-67.
# Every entry is VERIFIED against the real HF module structure constructed
# offline from its default config (== the named checkpoint's config) by
# tests/test_text_encoders.py:
#   * align text tower = exact BERT-base
#   * blip text = BERT layout, 8 heads, vocab 30524, no token-type embeddings
#     (its per-layer cross-attention weights are dead without vision input and
#     are skipped by the converter)
#   * flava text = BERT embeddings (incl. token types + emb LN) over ViT-style
#     PRE-LN blocks (layernorm_before/after) with a trailing LayerNorm
#   * clip / groupvit = CLIP pre-LN, causal, quick-gelu, no emb LN, final LN
TEXT_ARCHS = {
    "bert": TextArch(30522, 768, 12, 12, 3072, 512),
    "align": TextArch(30522, 768, 12, 12, 3072, 512),
    "blip": TextArch(30524, 768, 12, 8, 3072, 512, type_vocab=0, dropout=0.0),
    "falva": TextArch(30522, 768, 12, 12, 3072, 512, style="preln",  # (sic) reference key
                      dropout=0.0, final_ln=True),
    "clip": TextArch(49408, 512, 12, 8, 2048, 77, style="preln", causal=True,
                     act="quick_gelu", type_vocab=0, dropout=0.0,
                     emb_ln=False, final_ln=True, ln_eps=1e-5),
    "groupvit": TextArch(49408, 256, 12, 4, 1024, 77, style="preln",
                         causal=True, act="quick_gelu", type_vocab=0,
                         dropout=0.0, emb_ln=False, final_ln=True,
                         ln_eps=1e-5),
}


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class _DenseP(nn.Module):
    """Declares nn.Dense-shaped params (same names/inits/dtypes) without the
    forward, so the fused-block kernels (ops/block_pallas.py) can consume
    them while keeping the checkpoint tree IDENTICAL to the unfused path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _LnP(nn.Module):
    """nn.LayerNorm-shaped params (scale/bias) for the fused-block path."""

    @nn.compact
    def __call__(self, h: int):
        s = self.param("scale", nn.initializers.ones, (h,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (h,), jnp.float32)
        return s, b


class _AttnP(nn.Module):
    """Param shell matching _SelfAttention's tree (attn/{qkv,out})."""

    hidden: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseP(3 * self.hidden, name="qkv")(self.hidden)
        wo, bo = _DenseP(self.hidden, name="out")(self.hidden)
        return wqkv, bqkv, wo, bo


class _BlockP(nn.Module):
    """Param shell for one full post-LN layer (fused_block="tower"):
    declares every _Block param with IDENTICAL tree paths and returns the
    12 leaves for the tower megakernel."""

    arch: TextArch

    @nn.compact
    def __call__(self):
        a = self.arch
        h = a.hidden
        wqkv, bqkv, wo, bo = _AttnP(h, name="attn")()
        g1, b1 = _LnP(name="attn_ln")(h)
        w1, c1 = _DenseP(a.intermediate, name="ffn_in")(h)
        w2, c2 = _DenseP(h, name="ffn_out")(a.intermediate)
        g2, b2 = _LnP(name="ffn_ln")(h)
        return (wqkv, bqkv, wo, bo, g1, b1, w1, c1, w2, c2, g2, b2)


class _SelfAttention(nn.Module):
    arch: TextArch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True, drop_plan=None) -> jnp.ndarray:
        a = self.arch
        d_head = a.hidden // a.heads
        b, t, _ = x.shape
        # fused QKV projection: one (hidden -> 3*hidden) GEMM instead of
        # three — at the reference's 768 tokens/step each small GEMM runs far
        # below MXU peak, so merging cuts fixed per-op cost fwd AND bwd.
        # Weight layout: [q | k | v] concatenated on the output axis
        # (engine/convert.py packs HF q/k/v weights the same way).
        qkv = nn.Dense(3 * a.hidden, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, a.heads, d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        score = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
        score = score / jnp.sqrt(jnp.float32(d_head))
        neg = jnp.finfo(jnp.float32).min
        att_mask = mask[:, None, None, :]  # (B, 1, 1, T) keys
        if a.causal:
            causal = jnp.tril(jnp.ones((t, t), bool))
            score = jnp.where(causal[None, None], score, neg)
        score = jnp.where(att_mask, score, neg)
        probs = nn.softmax(score, axis=-1).astype(self.dtype)
        if a.dropout and drop_plan is not None:
            probs = drop_plan.take(probs)
        elif a.dropout:
            probs = nn.Dropout(a.dropout, deterministic=deterministic,
                               name="attn_drop")(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(b, t, a.hidden)
        return nn.Dense(a.hidden, dtype=self.dtype, name="out")(out)


class _Block(nn.Module):
    arch: TextArch
    dtype: Dtype = jnp.float32
    fused_ln: bool = False
    fused_block: str = "none"   # "none" | "ffn" | "attn" | "both"

    def _bits(self, shape, drop_plan):
        """uint32 dropout bits for one fused-kernel site (same budget and
        semantics as _DropPlan.take, which the unfused sites keep using)."""
        if drop_plan is not None:
            return drop_plan.take_bits(shape)
        return jax.random.bits(self.make_rng("dropout"), shape, jnp.uint32)

    def _fused_postln(self, x, mask, deterministic, drop_plan):
        """Post-LN block via the fused half-layer Pallas kernels
        (ops/block_pallas.py); param tree identical to the unfused path.

        Params cross the kernel boundary as fp32 masters (cast happens
        in-kernel — removing the materialized convert + copy pairs the
        first cut paid per boundary). Dropout bits: the fused_dropout plan
        or CPU interpret use host bits; otherwise the in-kernel Mosaic
        PRNG, seeded once per layer (fwd and bwd reseed identically)."""
        from text_guided_face_recognition_tpu.ops.block_pallas import (
            attn_block, ffn_block)
        a = self.arch
        b, t, h = x.shape
        interpret = jax.default_backend() == "cpu"
        rate = float(a.dropout) if (a.dropout and not deterministic) else 0.0
        use_prng = rate > 0.0 and drop_plan is None and not interpret
        dummy = jnp.zeros((8, 128), jnp.uint32)
        seed0 = jnp.zeros((1, 1), jnp.int32)
        if use_prng:
            seed0 = jax.random.randint(self.make_rng("dropout"), (1, 1),
                                       0, np.iinfo(np.int32).max,
                                       jnp.int32)
        x2 = x.reshape(b * t, h)
        mask_i = mask.astype(jnp.int32)

        if self.fused_block in ("attn", "both"):
            wqkv, bqkv, wo, bo = _AttnP(h, name="attn")()
            g1, b1 = _LnP(name="attn_ln")(h)
            if rate > 0.0 and not use_prng:
                bits_p = self._bits((a.heads * b, t, t), drop_plan)
                bits_h = self._bits((b * t, h), drop_plan)
            else:
                bits_p = bits_h = dummy
            x2 = attn_block(
                x2, mask_i, wqkv, bqkv, wo, bo, g1, b1,
                bits_p, bits_h, seed0, b, t, a.heads, rate, a.ln_eps,
                use_prng, interpret)
        else:
            h_att = _SelfAttention(a, self.dtype, name="attn")(
                x, mask, deterministic, drop_plan)
            if a.dropout and drop_plan is not None:
                h_att = drop_plan.take(h_att)
            elif a.dropout:
                h_att = nn.Dropout(a.dropout, deterministic=deterministic,
                                   name="attn_out_drop")(h_att)
            x2 = _ln(self.fused_ln, a.ln_eps, self.dtype, "attn_ln")(
                x + h_att).reshape(b * t, h)

        if self.fused_block in ("ffn", "both"):
            w1, c1 = _DenseP(a.intermediate, name="ffn_in")(h)
            w2, c2 = _DenseP(h, name="ffn_out")(a.intermediate)
            g2, b2 = _LnP(name="ffn_ln")(h)
            bits_f = (self._bits((b * t, h), drop_plan)
                      if rate > 0.0 and not use_prng else dummy)
            # distinct PRNG stream from the attention kernel's
            seed_f = seed0 ^ jnp.int32(0x5BD1E995) if use_prng else seed0
            x2 = ffn_block(x2, w1, c1, w2, c2, g2, b2, bits_f, seed_f,
                           rate, a.ln_eps, use_prng, interpret)
        else:
            y = x2.reshape(b, t, h)
            f = nn.Dense(a.intermediate, dtype=self.dtype, name="ffn_in")(y)
            f = _act(a.act)(f)
            f = nn.Dense(h, dtype=self.dtype, name="ffn_out")(f)
            if a.dropout and drop_plan is not None:
                f = drop_plan.take(f)
            elif a.dropout:
                f = nn.Dropout(a.dropout, deterministic=deterministic,
                               name="ffn_drop")(f)
            return _ln(self.fused_ln, a.ln_eps, self.dtype, "ffn_ln")(y + f)
        return x2.reshape(b, t, h)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True, drop_plan=None) -> jnp.ndarray:
        a = self.arch
        if self.fused_block != "none" and a.style == "postln":
            return self._fused_postln(x, mask, deterministic, drop_plan)
        act = _act(a.act)

        def drop(h, name):
            if a.dropout and drop_plan is not None:
                return drop_plan.take(h)
            if a.dropout:
                return nn.Dropout(a.dropout, deterministic=deterministic,
                                  name=name)(h)
            return h

        ln = functools.partial(_ln, self.fused_ln, a.ln_eps, self.dtype)
        if a.style == "postln":
            h = _SelfAttention(a, self.dtype, name="attn")(x, mask,
                                                           deterministic,
                                                           drop_plan)
            x = ln("attn_ln")(x + drop(h, "attn_out_drop"))
            h = nn.Dense(a.intermediate, dtype=self.dtype, name="ffn_in")(x)
            h = act(h)
            h = nn.Dense(a.hidden, dtype=self.dtype, name="ffn_out")(h)
            x = ln("ffn_ln")(x + drop(h, "ffn_drop"))
        else:  # preln (CLIP/ViT-style)
            h = ln("attn_ln")(x)
            h = _SelfAttention(a, self.dtype, name="attn")(h, mask,
                                                           deterministic,
                                                           drop_plan)
            x = x + drop(h, "attn_out_drop")
            h = ln("ffn_ln")(x)
            h = nn.Dense(a.intermediate, dtype=self.dtype, name="ffn_in")(h)
            h = act(h)
            h = nn.Dense(a.hidden, dtype=self.dtype, name="ffn_out")(h)
            x = x + drop(h, "ffn_drop")
        return x


class TransformerEncoder(nn.Module):
    """Configurable BERT/CLIP-style text transformer; returns last hidden
    states (B, T, hidden)."""

    arch: TextArch
    dtype: Dtype = jnp.float32
    fused_ln: bool = False
    fused_dropout: bool = False
    fused_block: str = "none"   # Pallas kernels ("ffn"/"attn"/"both"/"tower")

    def _site_bits(self, shape, plan):
        if plan is not None:
            return plan.take_bits(shape)
        return jax.random.bits(self.make_rng("dropout"), shape, jnp.uint32)

    def _tower(self, x, mask, deterministic, plan):
        """All layers in ONE Pallas kernel each way (fused_block="tower",
        ops/block_pallas.tower_block): per-layer weights stacked + cast
        once per step (the stack/cast VJPs restore per-leaf fp32 grads;
        param tree unchanged — _BlockP declares identical paths)."""
        from text_guided_face_recognition_tpu.ops.block_pallas import (
            tower_block)
        a = self.arch
        b, t, h = x.shape
        dt = self.dtype
        interpret = jax.default_backend() == "cpu"
        rate = float(a.dropout) if (a.dropout and not deterministic) else 0.0
        use_prng = rate > 0.0 and plan is None and not interpret
        leaves = [_BlockP(a, name=f"layer_{i}")() for i in range(a.layers)]

        def stk(idx, bias=False):
            arrs = [lv[idx] for lv in leaves]
            if bias:
                arrs = [v.reshape(1, -1) for v in arrs]
            return jnp.stack(arrs).astype(dt)

        dummy = jnp.zeros((8, 128), jnp.uint32)
        seed0 = jnp.zeros((1, 1), jnp.int32)
        bits_p = bits_h = bits_f = dummy
        if use_prng:
            seed0 = jax.random.randint(self.make_rng("dropout"), (1, 1),
                                       0, np.iinfo(np.int32).max,
                                       jnp.int32)
        elif rate > 0.0:
            # host bits, same per-layer site order as the "both" path
            # (probs, hidden, ffn) so the fused_dropout plan budget and a
            # layer-by-layer equivalence test line up exactly
            bp, bh, bf = [], [], []
            for _ in range(a.layers):
                bp.append(self._site_bits((a.heads * b, t, t), plan))
                bh.append(self._site_bits((b * t, h), plan))
                bf.append(self._site_bits((b * t, h), plan))
            bits_p, bits_h, bits_f = (jnp.stack(bp), jnp.stack(bh),
                                      jnp.stack(bf))
        z = tower_block(
            x.reshape(b * t, h), mask.astype(jnp.int32),
            stk(0), stk(1, True), stk(2), stk(3, True), stk(4, True),
            stk(5, True), stk(6), stk(7, True), stk(8), stk(9, True),
            stk(10, True), stk(11, True), bits_p, bits_h, bits_f, seed0,
            b, t, a.heads, rate, a.ln_eps, use_prng, interpret)
        return z.reshape(b, t, h)

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        a = self.arch
        fb = self.fused_block
        _FB_MODES = ("none", "ffn", "attn", "both", "tower")
        if fb not in _FB_MODES:
            # A typo ('towre', 'all', ...) must not silently run unfused
            # while the user believes the megakernels are on.
            raise ValueError(
                f"fused_block={fb!r} is not one of {_FB_MODES}")
        if fb != "none" and (a.style != "postln" or a.act != "gelu"
                             or a.hidden // a.heads != 64):
            # The Pallas kernels are validated only for post-LN gelu towers
            # with d_head == 64 (bert/align): 64-wide lane slices are the
            # only per-head layout verified to lower in Mosaic
            # (ops/block_pallas.py). blip (8 heads, d_head=96) stays on the
            # unfused path until validated on-chip.
            import warnings
            warnings.warn(
                f"fused_block={fb!r} supports post-LN gelu archs with "
                f"d_head == 64 only (bert/align); falling back to the "
                f"unfused path for style={a.style!r} act={a.act!r} "
                f"d_head={a.hidden // a.heads}")
            fb = "none"
        b, t = input_ids.shape
        plan = None
        if self.fused_dropout and a.dropout and not deterministic:
            bits = jax.random.bits(self.make_rng("dropout"),
                                   (_DropPlan.total_elems(a, b, t),),
                                   jnp.uint32)
            plan = _DropPlan(bits, a.dropout)
        x = nn.Embed(a.vocab_size, a.hidden, dtype=self.dtype,
                     name="tok_emb")(input_ids)
        pos = jnp.arange(t)[None, :]
        x = x + nn.Embed(a.max_positions, a.hidden, dtype=self.dtype,
                         name="pos_emb")(pos)
        if a.type_vocab:
            x = x + nn.Embed(a.type_vocab, a.hidden, dtype=self.dtype,
                             name="type_emb")(jnp.zeros_like(input_ids))
        if a.emb_ln:
            x = _ln(self.fused_ln, a.ln_eps, self.dtype, "emb_ln")(x)
        if a.dropout and plan is not None:
            x = plan.take(x)
        elif a.dropout:
            x = nn.Dropout(a.dropout, deterministic=deterministic,
                           name="emb_drop")(x)
        mask = attention_mask.astype(bool)
        if fb == "tower":
            x = self._tower(x, mask, deterministic, plan)
        else:
            for i in range(a.layers):
                x = _Block(a, self.dtype, self.fused_ln, fb,
                           name=f"layer_{i}")(x, mask, deterministic, plan)
        if a.final_ln:
            x = _ln(self.fused_ln, a.ln_eps, self.dtype, "final_ln")(x)
        return x


class TextEncoder(nn.Module):
    """bert_type-switched encoder with the reference's output contract
    (reference: models/models.py:144-167): returns
    (words_emb = hidden[:, 1:, :], sent_emb = hidden[:, 0, :])."""

    bert_type: str = "bert"
    dtype: Dtype = jnp.float32
    fused_ln: bool = False
    fused_dropout: bool = False
    fused_block: str = "none"

    @nn.compact
    def __call__(self, captions: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        arch = TEXT_ARCHS[self.bert_type]
        hidden = TransformerEncoder(arch, self.dtype, self.fused_ln,
                                    self.fused_dropout, self.fused_block,
                                    name="model")(
            captions, mask, deterministic)
        sent_emb = hidden[:, 0, :]
        words_emb = hidden[:, 1:, :]
        return words_emb, sent_emb


class BertWordMapping(nn.Module):
    """Three token-window projections K in {2,3,4} with ReLU
    (reference: models/models.py:170-184 `Bert_Word_Mapping`).

    Conv2d(1, F, (K, E)) over the (tokens x E) map fully contracts the
    embedding axis — i.e. a dense layer over K stacked tokens. Expressed here
    as window-stacking + one GEMM per scale (MXU-shaped, no 1-channel convs).

    Input: (B, T, E) token features; output: list of (B, T-K+1, F).
    """

    feat_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, words_emb: jnp.ndarray):
        outs = []
        for ki, K in enumerate((2, 3, 4)):
            t = words_emb.shape[1] - K + 1
            win = jnp.concatenate(
                [words_emb[:, i:i + t, :] for i in range(K)], axis=-1)
            y = nn.Dense(self.feat_dim, dtype=self.dtype,
                         name=f"conv_k{K}")(win)
            outs.append(nn.relu(y))
        return outs


class TextHeading(nn.Module):
    """FCAM text head (reference: models/models.py:187-232).

    __call__(words_emb (B, T-1, E)) -> (words (B, F, T-2), sent (B, F)):
      * per-word features: element-wise max across the three window scales,
        with scale k available only where the window fits — vectorized via
        -inf padding instead of the reference's per-(batch, position) loop
        (models/models.py:197-213)
      * sentence feature: per-scale max-pool over time, averaged across
        scales (models/models.py:216-220)
    """

    feat_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, words_emb: jnp.ndarray,
                 sent_emb: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a, b, c = BertWordMapping(self.feat_dim, self.dtype,
                                  name="bwm")(words_emb)
        t_out = a.shape[1]  # = T_in - 1 = bert_words_num - 2

        neg = jnp.finfo(jnp.float32).min

        def pad_to(x):
            d = t_out - x.shape[1]
            if d == 0:
                return x.astype(jnp.float32)
            return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, d), (0, 0)),
                           constant_values=neg)

        words = jnp.maximum(jnp.maximum(pad_to(a), pad_to(b)), pad_to(c))
        words = l2_normalize(words, axis=-1)            # (B, T_out, F)
        words = jnp.swapaxes(words, 1, 2)               # (B, F, T_out)

        sent = (jnp.max(a, axis=1) + jnp.max(b, axis=1) + jnp.max(c, axis=1)) / 3.0
        sent = l2_normalize(sent.astype(jnp.float32), axis=-1)
        return words.astype(jnp.float32), sent
