"""Supertonic-3-style TTS (31 languages, 44.1 kHz, flow matching + CFG).

Explicit JAX equivalents of the reference's 4 CoreML stages
(`TTS/TtsBackend.swift:24-30`, `Supertonic3/Supertonic3Manager.swift:36`):
text_encoder -> duration_predictor -> vector_estimator (8-step flow matching
WITH classifier-free guidance) -> vocoder; unicode-indexer tokenization;
per-voice style JSON.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 44_100
HOP = 441  # 10 ms @ 44.1 kHz
LATENT_DIM = 64
FLOW_STEPS = 8


@dataclass(frozen=True)
class Supertonic3Config:
    vocab_size: int = 2048  # unicode-indexer buckets
    d_model: int = 384
    n_layers: int = 6
    n_heads: int = 6
    style_dim: int = 128
    max_tokens: int = 256
    max_frames: int = 1000  # 10 s per chunk
    cfg_scale: float = 2.0  # classifier-free guidance
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


SUPERTONIC3_BASE = Supertonic3Config()
SUPERTONIC3_TEST = Supertonic3Config(d_model=32, n_layers=1, n_heads=4,
                                     max_tokens=32, max_frames=64)


def unicode_tokenize(text: str, vocab_size: int, max_tokens: int) -> list[int]:
    """Unicode-indexer tokenization: codepoints bucketed into the vocab."""
    return [1 + (ord(c) % (vocab_size - 2)) for c in text[:max_tokens]]


class Supertonic3Text(nn.Module):
    """text_encoder + duration_predictor."""

    cfg: Supertonic3Config

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
        s = nn.Dense(cfg.d_model, dtype=dt, name="style_in")(style)[:, None, :]
        x = x + s
        for i in range(cfg.n_layers):
            h = nn.LayerNorm(dtype=dt, name=f"ln{i}")(x)
            x = x + nn.SelfAttention(num_heads=cfg.n_heads, dtype=dt, name=f"att{i}")(h, mask=att)
            f = nn.LayerNorm(dtype=dt, name=f"fln{i}")(x)
            f = nn.Dense(cfg.d_model * 4, dtype=dt, name=f"ff1_{i}")(f)
            f = nn.gelu(f)
            x = x + nn.Dense(cfg.d_model, dtype=dt, name=f"ff2_{i}")(f)
        dur = nn.Dense(1, dtype=dt, name="dur")(x)[..., 0]
        return dur.astype(jnp.float32), x.astype(jnp.float32)


class Supertonic3Estimator(nn.Module):
    """vector_estimator: flow matching over frame latents with CFG."""

    cfg: Supertonic3Config

    @nn.compact
    def __call__(self, text_latents, frame_tokens, style, noise):
        """-> frame latents [B, F, LATENT_DIM] after FLOW_STEPS Euler w/ CFG."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        frames = jnp.take_along_axis(
            text_latents, frame_tokens[..., None], axis=1
        ).astype(dt)
        s = nn.Dense(cfg.d_model, dtype=dt, name="style_in")(style)[:, None, :]

        v1 = nn.Dense(cfg.d_model, dtype=dt, name="v1")
        v2 = nn.Dense(LATENT_DIM, dtype=dt, name="v2")
        t_emb = nn.Dense(cfg.d_model, dtype=dt, name="t_emb")

        def velocity(z, cond, t):
            h = v1(jnp.concatenate([z, cond], axis=-1)) + t_emb(t)
            return v2(nn.silu(h))

        z = noise.astype(dt)
        step = 1.0 / FLOW_STEPS
        for k in range(FLOW_STEPS):
            t = jnp.full(z.shape[:-1] + (1,), k * step, dt)
            v_cond = velocity(z, frames + s, t)
            v_uncond = velocity(z, jnp.zeros_like(frames), t)
            v = v_uncond + cfg.cfg_scale * (v_cond - v_uncond)  # CFG
            z = z + step * v
        return z.astype(jnp.float32)


class Supertonic3Vocoder(nn.Module):
    cfg: Supertonic3Config

    @nn.compact
    def __call__(self, latents, n_frames):
        """latents [B, F, LATENT_DIM] -> audio [B, F*HOP] @44.1 kHz."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, F, _ = latents.shape
        x = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="c1")(
            latents.astype(dt)
        )
        x = nn.silu(x)
        x = nn.Conv(cfg.d_model, (5,), padding="SAME", dtype=dt, name="c2")(x)
        x = nn.silu(x)
        audio = jnp.tanh(
            nn.Dense(HOP, dtype=dt, name="up")(x).reshape(B, F * HOP).astype(jnp.float32)
        )
        valid = jnp.arange(F * HOP)[None, :] < (n_frames * HOP)[:, None]
        return jnp.where(valid, audio, 0.0)
