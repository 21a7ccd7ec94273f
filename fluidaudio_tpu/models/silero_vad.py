"""Silero-style VAD network, TPU-native.

Explicit JAX equivalent of the reference's unified 256 ms Silero CoreML bundle
(`VAD/VadManager.swift:14-30`): input = 64-sample context + 4096 new samples,
LSTM h/c 128-d carried state, output = one speech probability + new states.

Internally (Silero v5 topology): the 4160-sample buffer is split into 8
subframes of (64 context + 512 new); each runs a learned STFT-basis conv ->
4-layer conv encoder -> LSTMCell(128) -> sigmoid head; the chunk probability
is the max over subframes (a chunk is speech if any 32 ms of it is). The
subframe loop is a `lax.scan`, so a whole utterance can additionally be
scanned over chunks inside one jit (see VadManager.process) — no host
round-trip per 256 ms like the reference's per-chunk CoreML calls.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SileroVadConfig:
    context_size: int = 64
    frame_size: int = 512  # 32 ms subframes
    chunk_size: int = 4096  # 256 ms public contract
    stft_filters: int = 129
    stft_kernel: int = 256
    stft_stride: int = 128
    encoder_dims: tuple[int, ...] = (128, 64, 64, 128)
    hidden: int = 128

    @property
    def subframes_per_chunk(self) -> int:
        return self.chunk_size // self.frame_size  # 8

    @property
    def model_input_size(self) -> int:
        return self.chunk_size + self.context_size  # 4160


class SileroVad(nn.Module):
    """One 256 ms chunk step: (audio [B, 4160], h [B,128], c [B,128]) ->
    (prob [B], h', c')."""

    cfg: SileroVadConfig = SileroVadConfig()

    @nn.compact
    def __call__(self, audio: jax.Array, h: jax.Array, c: jax.Array):
        cfg = self.cfg
        B = audio.shape[0]
        n_sub = cfg.subframes_per_chunk
        sub_w = cfg.context_size + cfg.frame_size  # 576

        # subframe i covers samples [i*512, i*512 + 576) of the 4160 buffer
        idx = (
            jnp.arange(n_sub)[:, None] * cfg.frame_size
            + jnp.arange(sub_w)[None, :]
        )  # [8, 576]
        frames = audio[:, idx]  # [B, 8, 576]

        stft = nn.Conv(
            cfg.stft_filters,
            (cfg.stft_kernel,),
            strides=(cfg.stft_stride,),
            padding="VALID",
            use_bias=False,
            name="stft_basis",
        )
        convs = [
            nn.Conv(d, (3,), padding="SAME", name=f"enc{i}")
            for i, d in enumerate(cfg.encoder_dims)
        ]
        lstm = _LstmCellDense(cfg.hidden, name="lstm")
        head = nn.Dense(1, name="head")

        def subframe_step(carry, frame):
            h, c = carry
            x = jnp.abs(stft(frame[:, :, None]))  # [B, t, 129] magnitude-ish
            for conv in convs:
                x = nn.relu(conv(x))
            feat = x.mean(axis=1)  # [B, 128]
            h2, c2 = lstm(feat, h, c)
            prob = jax.nn.sigmoid(head(nn.relu(h2))[:, 0])
            return (h2, c2), prob

        (h_out, c_out), probs = _manual_scan(subframe_step, (h, c), frames)

        chunk_prob = jnp.max(probs, axis=0)  # [B]
        return chunk_prob, h_out, c_out


def _manual_scan(step, carry, frames):
    """Unrolled loop over the 8 subframes (static count; lets flax share params)."""
    probs = []
    for i in range(frames.shape[1]):
        carry, p = step(carry, frames[:, i])
        probs.append(p)
    return carry, jnp.stack(probs)


class _LstmCellDense(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x, h, c):
        z = nn.Dense(4 * self.hidden, name="ih")(x) + nn.Dense(
            4 * self.hidden, name="hh"
        )(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        return h2, c2


# --------------------------------------------------------------------------
# Checkpoint-convertible Silero v5 (upstream jit key layout)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class SileroV5Config:
    """Upstream silero-vad v5 topology (from the published jit state dict:
    stft.forward_basis_buffer [258,1,256]; encoder.{0..3}.reparam_conv;
    decoder.rnn LSTMCell(128); decoder.decoder.2 Conv1d(128,1,1))."""

    context_size: int = 64
    frame_size: int = 512
    stft_kernel: int = 256
    stft_stride: int = 128
    stft_pad: int = 64  # reflect pad both sides before the basis conv
    encoder_dims: tuple[int, ...] = (128, 64, 64, 128)
    encoder_strides: tuple[int, ...] = (1, 2, 2, 1)
    hidden: int = 128


class SileroVadV5(nn.Module):
    """One 32 ms frame step, upstream-exact graph:
    (frame [B, 576] = 64 context + 512 new, h [B,128], c [B,128])
    -> (prob [B], h', c').

    Convertible from the silero-vad v5 jit checkpoint via `convert/silero.py`
    (the 258-filter STFT basis is a fixed conv kernel; first 129 rows are the
    real part, last 129 the imaginary part — magnitude feeds the encoder).
    """

    cfg: SileroV5Config = SileroV5Config()

    @nn.compact
    def __call__(self, frame: jax.Array, h: jax.Array, c: jax.Array):
        cfg = self.cfg
        n_bins = cfg.stft_kernel // 2 + 1  # 129

        x = jnp.pad(frame, ((0, 0), (cfg.stft_pad, cfg.stft_pad)), mode="reflect")
        basis = nn.Conv(2 * n_bins, (cfg.stft_kernel,), strides=(cfg.stft_stride,),
                        padding="VALID", use_bias=False, name="stft_basis")
        spec = basis(x[:, :, None])  # [B, T, 258]
        mag = jnp.sqrt(spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2 + 1e-12)

        y = mag
        for i, (d, s) in enumerate(zip(cfg.encoder_dims, cfg.encoder_strides)):
            y = nn.relu(nn.Conv(d, (3,), strides=(s,), padding=((1, 1),),
                                name=f"enc{i}")(y))
        feat = y.mean(axis=1)  # collapse any residual time -> [B, 128]

        h2, c2 = _LstmCellDense(cfg.hidden, name="lstm")(feat, h, c)
        head = nn.Dense(1, name="head")
        prob = jax.nn.sigmoid(head(nn.relu(h2))[:, 0])
        return prob, h2, c2
