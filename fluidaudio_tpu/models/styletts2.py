"""StyleTTS2-style TTS stages (reference-audio style conditioning).

Explicit JAX equivalents of the reference's 8 CoreML stages
(`TTS/TtsBackend.swift:10-23`, `StyleTTS2/StyleTTS2Manager.swift:37`):
text_encoder -> bert -> ref_encoder (style from reference audio) ->
fused_diffusion_sampler (style sampling) -> duration_predictor ->
fused_f0n_har_source -> decoder_pre -> decoder_upsample. 24 kHz output.

TPU design: collapses into three jitted programs — style (ref_encoder +
diffusion sampler), text (text_encoder + bert + duration), and acoustic
(f0/noise/harmonic-source + decoder) — mirroring the Kokoro 2-program split
plus the style branch.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24_000
HOP = 240
STYLE_DIM = 128
DIFFUSION_STEPS = 5  # fused_diffusion_sampler bakes the schedule


@dataclass(frozen=True)
class StyleTts2Config:
    vocab_size: int = 178
    d_model: int = 512
    n_bert_layers: int = 4
    n_heads: int = 8
    max_tokens: int = 512
    max_frames: int = 1200
    n_mels: int = 80
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


STYLETTS2_BASE = StyleTts2Config()
STYLETTS2_TEST = StyleTts2Config(d_model=32, n_bert_layers=1, n_heads=4,
                                 max_tokens=64, max_frames=128)


class StyleEncoder(nn.Module):
    """ref_encoder + fused diffusion sampler: mel of reference audio -> style."""

    cfg: StyleTts2Config

    @nn.compact
    def __call__(self, ref_mel: jax.Array, noise: jax.Array) -> jax.Array:
        """ref_mel [B, n_mels, T], noise [B, STYLE_DIM] -> style [B, STYLE_DIM]."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = jnp.transpose(ref_mel, (0, 2, 1)).astype(dt)
        x = nn.Conv(cfg.d_model, (5,), strides=(2,), padding="SAME", dtype=dt,
                    name="conv1")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.d_model, (5,), strides=(2,), padding="SAME", dtype=dt,
                    name="conv2")(x)
        x = nn.silu(x)
        ref = x.mean(axis=1)  # [B, D]
        ref_style = nn.Dense(STYLE_DIM, dtype=dt, name="ref_head")(ref)

        # fused diffusion sampler: DIFFUSION_STEPS denoise steps conditioned on ref
        s = noise.astype(dt)
        d1 = nn.Dense(cfg.d_model, dtype=dt, name="d1")
        d2 = nn.Dense(STYLE_DIM, dtype=dt, name="d2")
        t_emb = nn.Dense(cfg.d_model, dtype=dt, name="t_emb")
        for k in range(DIFFUSION_STEPS):
            t = jnp.full((s.shape[0], 1), k / DIFFUSION_STEPS, dt)
            h = nn.silu(d1(jnp.concatenate([s, ref_style], axis=-1)) + t_emb(t))
            s = s + d2(h) / DIFFUSION_STEPS
        return (s + ref_style).astype(jnp.float32)


class StyleTts2Text(nn.Module):
    """text_encoder + bert + duration_predictor."""

    cfg: StyleTts2Config

    @nn.compact
    def __call__(self, tokens, style, lengths):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, N = tokens.shape
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dt, name="embed")(tokens)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (cfg.max_tokens, cfg.d_model), jnp.float32)
        x = x + pos[:N][None].astype(dt)
        valid = jnp.arange(N)[None, :] < lengths[:, None]
        att = valid[:, None, None, :] & valid[:, None, :, None]
        for i in range(cfg.n_bert_layers):
            h = nn.LayerNorm(dtype=dt, name=f"ln{i}")(x)
            x = x + nn.SelfAttention(num_heads=cfg.n_heads, dtype=dt, name=f"att{i}")(h, mask=att)
            f = nn.LayerNorm(dtype=dt, name=f"fln{i}")(x)
            f = nn.Dense(cfg.d_model * 4, dtype=dt, name=f"ff1_{i}")(f)
            f = nn.gelu(f)
            x = x + nn.Dense(cfg.d_model, dtype=dt, name=f"ff2_{i}")(f)
        s = nn.Dense(cfg.d_model, dtype=dt, name="style_proj")(style)[:, None, :]
        xs = jnp.concatenate([x, jnp.broadcast_to(s, x.shape)], axis=-1)
        dur = nn.Dense(1, dtype=dt, name="dur_head")(
            nn.relu(nn.Dense(cfg.d_model, dtype=dt, name="dur_fc")(xs))
        )[..., 0]
        latents = nn.Dense(cfg.d_model, dtype=dt, name="latent")(xs)
        return dur.astype(jnp.float32), latents.astype(jnp.float32)


class StyleTts2Acoustic(nn.Module):
    """fused_f0n_har_source + decoder_pre + decoder_upsample -> samples."""

    cfg: StyleTts2Config

    @nn.compact
    def __call__(self, latents, frame_tokens, style, n_frames):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, F = frame_tokens.shape
        frames = jnp.take_along_axis(latents, frame_tokens[..., None], axis=1).astype(dt)
        s = nn.Dense(cfg.d_model, dtype=dt, name="style_proj")(style)[:, None, :]
        x = frames + s
        p = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="f0n1")(x)
        p = nn.silu(p)
        f0 = 80.0 + 400.0 * jax.nn.sigmoid(
            nn.Dense(1, dtype=dt, name="f0_head")(p)[..., 0].astype(jnp.float32)
        )
        # harmonic source
        f0_up = jnp.repeat(f0, HOP, axis=1)
        phase = jnp.cumsum(2 * np.pi * f0_up / SAMPLE_RATE, axis=1)
        source = jnp.sin(phase)

        d = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="dec_pre")(x)
        d = nn.silu(d)
        up = nn.Dense(HOP, dtype=dt, name="upsample")(d)  # [B, F, HOP]
        audio = up.reshape(B, F * HOP).astype(jnp.float32)
        audio = jnp.tanh(audio + 0.05 * source)
        valid = jnp.arange(F * HOP)[None, :] < (n_frames * HOP)[:, None]
        return jnp.where(valid, audio, 0.0)
