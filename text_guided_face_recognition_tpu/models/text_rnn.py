"""Bidirectional LSTM/GRU caption encoder, flax-native.

Behavioral equivalent of the reference RNNEncoder (reference:
models/models.py:236-324): Embedding(vocab, 300) -> dropout 0.5 -> 1-layer
bidirectional LSTM/GRU (hidden = embedding_dim/2 per direction) producing
  * words_emb (B, embedding_dim, T) — per-timestep outputs, zero beyond each
    caption's length (the reference's pack/pad_packed round trip)
  * sent_emb (B, embedding_dim) — the final hidden state at each caption's
    true length, l2-normalized.

TPU-native: instead of sorting by length + PackedSequence (the reference's
`sort_sents -> pack_padded_sequence -> rm_sort` dance,
utils/dataset_utils.py:15-53), sequences stay in order and masking is handled
by flax's length-aware scan (`nn.RNN(seq_lengths=...)`) — identical math for
inference and for the loss surface, no host-side sorting, fully static shapes
under jit. Parity with torch's packed LSTM is covered by a golden test.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from text_guided_face_recognition_tpu.models.layers import l2_normalize

Dtype = Any

__all__ = ["RNNEncoder"]


class RNNEncoder(nn.Module):
    vocab_size: int
    en_type: str = "LSTM"          # "LSTM" | "GRU"
    ninput: int = 300              # embedding size (reference default)
    nhidden: int = 256             # total hidden (split across directions)
    drop_prob: float = 0.5
    bidirectional: bool = True
    unroll: int = 1                # lax.scan unroll factor (param-tree-neutral)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, captions: jnp.ndarray, cap_lens: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_dir = 2 if self.bidirectional else 1
        h = self.nhidden // num_dir

        emb = nn.Embed(
            self.vocab_size, self.ninput, dtype=self.dtype,
            embedding_init=nn.initializers.uniform(scale=0.1),  # ref :279-281
            name="encoder")(captions)
        emb = nn.Dropout(self.drop_prob, deterministic=deterministic,
                         name="drop")(emb)

        if self.en_type == "LSTM":
            make_cell = lambda name: nn.OptimizedLSTMCell(h, dtype=self.dtype,
                                                          name=name)
        elif self.en_type == "GRU":
            make_cell = lambda name: nn.GRUCell(h, dtype=self.dtype, name=name)
        else:
            raise NotImplementedError(self.en_type)

        lens = cap_lens.astype(jnp.int32)
        fwd_out = nn.RNN(make_cell("fwd"), unroll=self.unroll,
                         name="rnn_fwd")(emb, seq_lengths=lens)
        # final hidden at each caption's true length: for an (O)LSTM/GRU the
        # per-step output IS the hidden state, so gather instead of trusting
        # the scan carry (packed-LSTM-exact; parity-tested against torch)
        idx = jnp.maximum(lens - 1, 0)[:, None, None]
        outs = [fwd_out]
        finals = [jnp.take_along_axis(fwd_out, idx, axis=1)[:, 0, :]]
        if self.bidirectional:
            bwd_out = nn.RNN(make_cell("bwd"), reverse=True, keep_order=True,
                             unroll=self.unroll, name="rnn_bwd")(
                emb, seq_lengths=lens)
            outs.append(bwd_out)
            finals.append(bwd_out[:, 0, :])  # backward final = position 0

        output = jnp.concatenate(outs, axis=-1)       # (B, T, nhidden)
        # zero outputs past each caption's length (pad_packed semantics)
        t = captions.shape[1]
        valid = (jnp.arange(t)[None, :] < lens[:, None])[..., None]
        output = jnp.where(valid, output, 0.0)

        words_emb = jnp.swapaxes(output, 1, 2)        # (B, nhidden, T)
        sent_emb = jnp.concatenate(finals, axis=-1)   # (B, nhidden)
        sent_emb = l2_normalize(sent_emb.astype(jnp.float32), axis=-1)
        return words_emb.astype(jnp.float32), sent_emb
