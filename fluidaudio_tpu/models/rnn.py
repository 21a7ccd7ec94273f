"""Length-aware LSTM layers (torch gate order) shared by TTS/ASR rebuilds.

The reference's models run LSTMs inside opaque CoreML graphs with exact
sequence lengths; our jitted programs run on padded static-shape buckets, so
the bidirectional pass must not let padding flow into the valid region. The
backward direction is realized as gather-reverse of the valid prefix per row
(`rev[t] = x[L-1-t]`), a plain `lax.scan`, and un-reverse — everything static
shape, no ragged control flow.

Gate order follows torch (i, f, g, o) so converted `weight_ih/hh` tensors map
1:1 (see fluidaudio_tpu/convert/*).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LstmCellSeq(nn.Module):
    """Full-sequence unidirectional LSTM: [B, T, I] -> [B, T, H]."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        class Step(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self, carry, xt):
                h, c = carry
                z = (nn.Dense(4 * self.hidden, name="ih")(xt)
                     + nn.Dense(4 * self.hidden, name="hh")(h))
                i, f, g, o = jnp.split(z, 4, axis=-1)
                c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
                return (h2, c2), h2

        scan = nn.scan(Step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        B = x.shape[0]
        zeros = jnp.zeros((B, self.hidden), x.dtype)
        _, ys = scan(self.hidden, name="cell")((zeros, zeros), x)
        return ys


def reverse_by_length(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse the valid prefix of each row: out[b, t] = x[b, L_b-1-t] for
    t < L_b, zeros after. Static shape; used for the backward LSTM pass."""
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)
    idx = jnp.clip(lengths[:, None] - 1 - t[None, :], 0, T - 1)  # [B, T]
    rev = jnp.take_along_axis(
        x, idx.reshape(B, T, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1
    )
    valid = (t[None, :] < lengths[:, None]).reshape(B, T, *([1] * (x.ndim - 2)))
    return jnp.where(valid, rev, 0)


class BiLstm(nn.Module):
    """Length-masked bidirectional LSTM: [B, T, I] -> [B, T, 2*hidden].

    Matches torch `nn.LSTM(bidirectional=True)` over pack_padded_sequence:
    padding positions output zero and never contaminate the backward pass.
    """

    hidden: int

    @nn.compact
    def __call__(self, x, lengths=None):
        B, T = x.shape[0], x.shape[1]
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        x = jnp.where(valid, x, 0)
        fwd = LstmCellSeq(self.hidden, name="fwd")(x)
        xr = reverse_by_length(x, lengths)
        bwd = LstmCellSeq(self.hidden, name="bwd")(xr)
        bwd = reverse_by_length(bwd, lengths)
        out = jnp.concatenate([fwd, bwd], axis=-1)
        return jnp.where(valid, out, 0)
