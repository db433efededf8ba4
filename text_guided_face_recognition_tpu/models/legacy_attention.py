"""AttnGAN generator-side attention primitives (legacy capability surface).

Behavioral ports of reference models/attention.py:46-130 (`SpatialAttention`,
`ChannelAttention`) — unused by any entry point in the reference (SURVEY.md
§2.6), kept for API-surface completeness. NHWC layouts; the reference's
1x1-conv context projections become channel Dense layers.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

__all__ = ["SpatialAttention", "ChannelAttention"]


class SpatialAttention(nn.Module):
    """Word-context spatial attention (reference: models/attention.py:46-100).

    inputs: image features (B, H, W, idf); context (B, sourceL, cdf).
    Returns (weighted_context (B, idf, queryL), attn (B, H, W, sourceL))."""

    idf: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, context: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, _ = inputs.shape
        query_l = h * w
        source = nn.Dense(self.idf, use_bias=False, dtype=self.dtype,
                          name="conv_context")(context)    # (B, L, idf)
        target = inputs.reshape(b, query_l, -1)             # (B, QL, idf)
        attn = jnp.einsum("bqd,bld->bql", target, source)
        if mask is not None:
            attn = jnp.where(mask[:, None, :], -jnp.inf, attn)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1)
        weighted = jnp.einsum("bld,bql->bdq", source,
                              attn.astype(source.dtype))    # (B, idf, QL)
        return weighted, attn.reshape(b, h, w, -1)


class ChannelAttention(nn.Module):
    """Channel-wise attention over projected context
    (reference: models/attention.py:102-130). The reference projects the
    context to ih*iw channels with resolution-specific 1x1 convs (64^2 /
    128^2); here one Dense sized from the call-time resolution."""

    idf: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, weighted_context: jnp.ndarray, context: jnp.ndarray,
                 ih: int, iw: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, source_l, _ = context.shape
        source_c = nn.Dense(ih * iw, use_bias=False, dtype=self.dtype,
                            name=f"conv_context{ih}")(context)  # (B, L, HW)
        source_c = jnp.swapaxes(source_c, 1, 2)                  # (B, HW, L)
        # attention over context entries, per channel of weighted_context
        attn_c = jnp.einsum("bdq,bql->bdl", weighted_context, source_c)
        attn_c = nn.softmax(attn_c.astype(jnp.float32), axis=-1)
        weighted_c = jnp.einsum("bql,bdl->bqd", source_c,
                                attn_c.astype(source_c.dtype))   # (B, HW, idf)
        return weighted_c.reshape(b, ih, iw, -1), attn_c
