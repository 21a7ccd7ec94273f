"""Silero VAD v5 network, TPU-native.

Behavioral parity: the reference wraps the upstream silero-vad v5 model as a
unified 256 ms CoreML bundle (`VAD/VadManager.swift:14-30`: input = 64-sample
context + 4096 new samples, LSTM h/c 128-d carried state, one probability per
chunk) and pays one CoreML round-trip per chunk.

TPU re-design: the model is kept at its native 32 ms frame granularity
(64 context + 512 new samples) and split into its data-parallel and
state-serial halves:

* `SileroVadV5.encode` — STFT-basis conv + 4-layer conv encoder. Depends
  ONLY on audio (each frame's 64-sample context comes from the raw waveform,
  not from model state), so a whole utterance's frames — or a batch of
  utterances — run as ONE batched conv stack on the MXU.
* the LSTM cell + sigmoid head — the only truly sequential part, 128-d.
  `vad_frame_program` precomputes the input-side projection (`z_ih`)
  batched, then `lax.scan`s just the 128x512 recurrent matmul + gates, and
  applies the head batched over all per-frame hidden states afterwards.

The 256 ms public contract (one probability per 4096-sample chunk) is the max
over the chunk's 8 frame probabilities — a chunk is speech if any 32 ms of it
is. See `vad/manager.py` for the utterance/batch drivers.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


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

    @property
    def window_size(self) -> int:
        return self.context_size + self.frame_size  # 576


class _LstmCellDense(nn.Module):
    hidden: int

    def setup(self):
        self.ih = nn.Dense(4 * self.hidden)
        self.hh = nn.Dense(4 * self.hidden)

    def input_proj(self, x: jax.Array) -> jax.Array:
        return self.ih(x)

    def step_from_z(self, z: jax.Array, h: jax.Array, c: jax.Array):
        """One cell step given the precomputed input projection `z`."""
        return lstm_gates(z + self.hh(h), c)

    def __call__(self, x, h, c):
        return self.step_from_z(self.ih(x), h, c)


def lstm_gates(zz: jax.Array, c: jax.Array):
    """(i,f,g,o) gate math shared by the flax cell and the scan program."""
    i, f, g, o = jnp.split(zz, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


class SileroVadV5(nn.Module):
    """One 32 ms frame step, upstream-exact graph:
    (frame [B, 576] = 64 context + 512 new, h [B,128], c [B,128])
    -> (prob [B], h', c').

    Convertible from the silero-vad v5 jit checkpoint via `convert/silero.py`
    (the 258-filter STFT basis is a fixed conv kernel; first 129 rows are the
    real part, last 129 the imaginary part — magnitude feeds the encoder).
    """

    cfg: SileroV5Config = SileroV5Config()

    def setup(self):
        cfg = self.cfg
        n_bins = cfg.stft_kernel // 2 + 1  # 129
        self.stft_basis = nn.Conv(
            2 * n_bins,
            (cfg.stft_kernel,),
            strides=(cfg.stft_stride,),
            padding="VALID",
            use_bias=False,
        )
        self.enc0 = nn.Conv(cfg.encoder_dims[0], (3,),
                            strides=(cfg.encoder_strides[0],), padding=((1, 1),))
        self.enc1 = nn.Conv(cfg.encoder_dims[1], (3,),
                            strides=(cfg.encoder_strides[1],), padding=((1, 1),))
        self.enc2 = nn.Conv(cfg.encoder_dims[2], (3,),
                            strides=(cfg.encoder_strides[2],), padding=((1, 1),))
        self.enc3 = nn.Conv(cfg.encoder_dims[3], (3,),
                            strides=(cfg.encoder_strides[3],), padding=((1, 1),))
        self.lstm = _LstmCellDense(cfg.hidden)
        self.head = nn.Dense(1)

    def encode(self, frames: jax.Array) -> jax.Array:
        """[N, 576] audio frames -> [N, 128] features. Pure conv stack — no
        recurrent state, so N can be every frame of a batch of utterances."""
        cfg = self.cfg
        n_bins = cfg.stft_kernel // 2 + 1
        x = jnp.pad(frames, ((0, 0), (cfg.stft_pad, cfg.stft_pad)), mode="reflect")
        spec = self.stft_basis(x[:, :, None])  # [N, t, 258]
        y = jnp.sqrt(spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2 + 1e-12)
        for conv in (self.enc0, self.enc1, self.enc2, self.enc3):
            y = nn.relu(conv(y))
        return y.mean(axis=1)  # [N, 128]

    def __call__(self, frame: jax.Array, h: jax.Array, c: jax.Array):
        feat = self.encode(frame)
        h2, c2 = self.lstm(feat, h, c)
        prob = jax.nn.sigmoid(self.head(nn.relu(h2))[:, 0])
        return prob, h2, c2


def vad_frame_program(
    model: SileroVadV5,
    params,
    audio: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    last_idx: jax.Array | None = None,
):
    """Whole-utterance (or batch-of-utterances) forward in one jit.

    audio [B, 64 + N*512]: per-row initial context prepended to the raw
    samples; frame j of row b is audio[b, j*512 : j*512 + 576], so adjacent
    frames share their 64-sample context through the waveform itself. int16
    audio is upcast on device (PCM scale 1/32768) — halving the
    host->device transfer, the dominant end-to-end cost on a remote link.
    h0/c0 [B, 128]. last_idx [B]: index of each row's last REAL frame (rows
    are bucket-padded; the causal scan makes the pad tail harmless).

    Returns (frame_probs [B, N], h_final [B, 128], c_final [B, 128]) with the
    final state gathered ON DEVICE at `last_idx` — downloading the full
    per-frame state history just to pick one row cost ~4 MB per call over the
    device link and dominated end-to-end latency.

    The LSTM gate math mirrors `_LstmCellDense` exactly
    (`tests/test_vad.py::test_frame_program_matches_sequential` pins it).
    """
    cfg = model.cfg
    if jnp.issubdtype(audio.dtype, jnp.integer):  # trace-time branch
        audio = audio.astype(jnp.float32) / 32768.0
    B, total = audio.shape
    n_frames = (total - cfg.context_size) // cfg.frame_size
    if last_idx is None:
        last_idx = jnp.full((B,), n_frames - 1, jnp.int32)
    idx = (
        jnp.arange(n_frames)[:, None] * cfg.frame_size
        + jnp.arange(cfg.window_size)[None, :]
    )  # [N, 576]
    frames = audio[:, idx]  # [B, N, 576]

    feats = model.apply(
        params, frames.reshape(B * n_frames, cfg.window_size),
        method=SileroVadV5.encode,
    ).reshape(B, n_frames, -1)

    p = params["params"]["lstm"]
    z_ih = feats @ p["ih"]["kernel"] + p["ih"]["bias"]  # [B, N, 4H] batched
    w_hh, b_hh = p["hh"]["kernel"], p["hh"]["bias"]

    def body(carry, z):
        h, c = carry
        h2, c2 = lstm_gates(z + h @ w_hh + b_hh, c)
        return (h2, c2), (h2, c2)

    _, (hs, cs) = jax.lax.scan(body, (h0, c0), jnp.moveaxis(z_ih, 1, 0))
    hs = jnp.moveaxis(hs, 0, 1)  # [B, N, H]
    cs = jnp.moveaxis(cs, 0, 1)

    ph = params["params"]["head"]
    probs = jax.nn.sigmoid(jax.nn.relu(hs) @ ph["kernel"] + ph["bias"])[..., 0]
    rows = jnp.arange(B)
    return probs, hs[rows, last_idx], cs[rows, last_idx]
