"""Kokoro-style parallel TTS model stages, TPU-native.

Explicit JAX equivalents of the reference's 7 CoreML stages
(`KokoroAne/Pipeline/KokoroAneSynthesizer.swift:17-160`): Albert ->
PostAlbert (duration) -> Alignment -> Prosody (F0/N) -> Noise -> Vocoder ->
Tail iSTFT, with per-stage fp16/fp32 placement on ANE.

TPU re-design: the 7 stages collapse into TWO jitted programs (SURVEY §7.7):
  text_program:   (tokens, style) -> (durations, text latents)
  audio_program:  (latents, frame->token alignment, style) -> 24 kHz samples
Duration rounding/clamping stays host-side (as in the reference), but frame
expansion is a device gather over a static max-frames grid. bf16 matmuls,
f32 iSTFT.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24_000
MAX_TOKENS = 512  # reference: <=512 IPA tokens per call w/ auto-chunking
HOP = 240  # 10 ms @ 24 kHz
N_FFT = 960
STYLE_DIM = 256  # style_s 128 + style_timbre 128 (voice pack layout)


@dataclass(frozen=True)
class KokoroConfig:
    vocab_size: int = 178  # IPA token table
    d_model: int = 512
    n_albert_layers: int = 6
    n_heads: int = 8
    max_frames: int = 1200  # 12 s per chunk at 10 ms hop
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class _TransformerBlock(nn.Module):
    d: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.SelfAttention(num_heads=self.heads, dtype=self.dtype)(h, mask=mask)
        x = x + h
        f = nn.LayerNorm(dtype=self.dtype)(x)
        f = nn.Dense(self.d * 4, dtype=self.dtype)(f)
        f = nn.gelu(f)
        f = nn.Dense(self.d, dtype=self.dtype)(f)
        return x + f


class KokoroTextProgram(nn.Module):
    """Albert + PostAlbert + Prosody-text: (tokens [B,N], style [B,256],
    lengths [B]) -> (log_durations [B,N], latents [B,N,D])."""

    cfg: KokoroConfig = KokoroConfig()

    @nn.compact
    def __call__(self, tokens, style, lengths):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, N = tokens.shape
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dt, name="embed")(tokens)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (MAX_TOKENS, cfg.d_model), jnp.float32
        )
        x = emb + pos[:N][None].astype(dt)
        valid = jnp.arange(N)[None, :] < lengths[:, None]
        att_mask = valid[:, None, None, :] & valid[:, None, :, None]
        for i in range(cfg.n_albert_layers):
            x = _TransformerBlock(cfg.d_model, cfg.n_heads, dt, name=f"albert{i}")(x, att_mask)

        s = nn.Dense(cfg.d_model, dtype=dt, name="style_proj")(style)[:, None, :]
        xs = jnp.concatenate([x, jnp.broadcast_to(s, x.shape)], axis=-1)
        dur_h = nn.Dense(cfg.d_model, dtype=dt, name="dur_fc1")(xs)
        dur_h = nn.relu(dur_h)
        log_dur = nn.Dense(1, dtype=dt, name="dur_fc2")(dur_h)[..., 0]
        latents = nn.Dense(cfg.d_model, dtype=dt, name="latent_proj")(xs)
        return log_dur.astype(jnp.float32), latents.astype(jnp.float32)


class KokoroAudioProgram(nn.Module):
    """Prosody + Noise + Vocoder + iSTFT:
    (latents [B,N,D], frame_tokens [B,F] int, style [B,256], n_frames [B]) ->
    audio [B, F*HOP] f32."""

    cfg: KokoroConfig = KokoroConfig()

    @nn.compact
    def __call__(self, latents, frame_tokens, style, n_frames):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, F = frame_tokens.shape
        # alignment: gather token latents per frame
        frames = jnp.take_along_axis(
            latents, frame_tokens[..., None], axis=1
        )  # [B, F, D]
        s = nn.Dense(cfg.d_model, dtype=dt, name="style_proj")(style)[:, None, :]
        x = frames.astype(dt) + s

        # prosody predictor (F0 / noise amplitude per frame)
        p = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="pros_conv1")(x)
        p = nn.silu(p)
        p = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="pros_conv2")(p)
        f0 = nn.Dense(1, dtype=dt, name="f0_head")(p)[..., 0]  # [B, F]
        noise_amp = jax.nn.softplus(nn.Dense(1, dtype=dt, name="noise_head")(p)[..., 0])

        # harmonic source: phase accumulation of predicted F0 (f32 on VPU)
        f0_hz = 80.0 + 400.0 * jax.nn.sigmoid(f0.astype(jnp.float32))
        f0_samples = jnp.repeat(f0_hz, HOP, axis=1)  # [B, F*HOP]
        phase = jnp.cumsum(2.0 * np.pi * f0_samples / SAMPLE_RATE, axis=1)
        harmonic = jnp.sin(phase)

        # vocoder trunk -> STFT magnitude + phase residual
        v = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="voc_conv1")(x)
        v = nn.silu(v)
        v = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="voc_conv2")(v)
        v = nn.silu(v)
        n_bins = N_FFT // 2 + 1
        mag = jax.nn.softplus(nn.Dense(n_bins, dtype=dt, name="mag_head")(v))
        phs = nn.Dense(n_bins, dtype=dt, name="phase_head")(v)

        # tail iSTFT (f32): overlap-add of mag * exp(i phase)
        spec = mag.astype(jnp.float32) * jnp.exp(1j * phs.astype(jnp.float32))
        frames_t = jnp.fft.irfft(spec, n=N_FFT, axis=-1)  # [B, F, N_FFT]
        window = jnp.asarray(np.hanning(N_FFT).astype(np.float32))
        frames_t = frames_t * window[None, None, :]
        audio = _overlap_add(frames_t, HOP)  # [B, F*HOP + N_FFT]
        audio = audio[:, N_FFT // 2 : N_FFT // 2 + F * HOP]

        # mix in the harmonic source + noise, mask invalid frames
        noise_gate = jnp.repeat(noise_amp.astype(jnp.float32), HOP, axis=1)
        audio = audio + 0.05 * harmonic * noise_gate
        sample_valid = (
            jnp.arange(F * HOP)[None, :] < (n_frames * HOP)[:, None]
        )
        return jnp.where(sample_valid, jnp.tanh(audio), 0.0)


def _overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """[B, F, W] -> [B, F*hop + W] via scatter-add."""
    B, F, W = frames.shape
    out_len = F * hop + W
    idx = (jnp.arange(F)[:, None] * hop + jnp.arange(W)[None, :]).reshape(-1)
    flat = frames.reshape(B, F * W)
    return jax.vmap(lambda row: jnp.zeros(out_len).at[idx].add(row))(flat)


def expand_durations(durations: np.ndarray, max_frames: int) -> tuple[np.ndarray, int]:
    """Host-side frame expansion (reference rounds/clamps host-side too):
    per-token integer durations -> frame->token index map [max_frames]."""
    durs = np.maximum(1, np.round(durations).astype(np.int64))
    total = int(durs.sum())
    if total > max_frames:
        # proportionally shrink to fit the static grid
        durs = np.maximum(1, (durs * max_frames / total).astype(np.int64))
        total = int(durs.sum())
    frame_tokens = np.zeros(max_frames, np.int32)
    pos = 0
    for tok_idx, d in enumerate(durs):
        frame_tokens[pos : pos + d] = tok_idx
        pos += d
    frame_tokens[pos:] = max(0, len(durs) - 1)
    return frame_tokens, total
