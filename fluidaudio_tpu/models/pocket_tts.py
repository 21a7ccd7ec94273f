"""PocketTTS-style streaming autoregressive TTS (flow-matching + mimi codec).

Explicit JAX equivalents of the reference's PocketTTS CoreML graphs
(`PocketTTS/Pipeline/PocketTtsSynthesizer.swift:4-13,142-287,498-707`,
`PocketTtsConstants.swift:4-62`):
  - cond_prefill / cond_step: decoder-only transformer with a 512-position KV
    cache; prefix = text embeddings + a 125-frame voice audio prompt
  - flowlm_step: one AR step -> next-frame conditioning + EOS logit
    (threshold -4.0)
  - flow_decoder_fused: 8 Euler steps of a conditional velocity field -> 32-d
    acoustic latent per 80 ms frame
  - mimi_decoder: latent -> 1920 samples @ 24 kHz with streaming conv states
  - voice cloning: mimi_encoder of a 1-30 s sample -> prompt latents

TPU design: prefill is one jitted call; the whole generation loop (flowlm ->
flow Euler -> mimi) is ONE `lax.scan` over max frames with an EOS done-mask —
the reference pays 3 CoreML calls per 80 ms frame, here zero host round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24_000
FRAME_SAMPLES = 1920  # 80 ms
LATENT_DIM = 32
KV_POSITIONS = 512
VOICE_PROMPT_FRAMES = 125
EOS_THRESHOLD = -4.0
EULER_STEPS = 8


@dataclass(frozen=True)
class PocketTtsConfig:
    vocab_size: int = 4000  # SentencePiece text tokens
    d_model: int = 512
    n_layers: int = 8
    n_heads: int = 8
    max_frames: int = 250  # 20 s per generate call
    mimi_channels: tuple[int, ...] = (256, 128, 64)
    mimi_kernel: int = 7
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


POCKET_BASE = PocketTtsConfig()
POCKET_TEST = PocketTtsConfig(
    vocab_size=64, d_model=32, n_layers=2, n_heads=4, max_frames=16,
    mimi_channels=(16, 8), mimi_kernel=5,
)


class KvCache(NamedTuple):
    k: jax.Array  # [L, B, KV_POSITIONS, H, Dh]
    v: jax.Array


def init_kv(cfg: PocketTtsConfig, batch: int) -> KvCache:
    shape = (cfg.n_layers, batch, KV_POSITIONS, cfg.n_heads, cfg.head_dim)
    return KvCache(jnp.zeros(shape, cfg.compute_dtype), jnp.zeros(shape, cfg.compute_dtype))


class FlowLm(nn.Module):
    """Decoder-only transformer over [text tokens | latent frames]."""

    cfg: PocketTtsConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.text_embed = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dt)
        self.latent_embed = nn.Dense(cfg.d_model, dtype=dt)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (KV_POSITIONS, cfg.d_model),
            jnp.float32,
        )
        self.blocks = [_KvBlock(cfg, name=f"blk{i}") for i in range(cfg.n_layers)]
        self.final_ln = nn.LayerNorm(dtype=dt)
        self.cond_head = nn.Dense(cfg.d_model, dtype=dt)
        self.eos_head = nn.Dense(1, dtype=dt)

    def embed_text(self, tokens):
        return self.text_embed(tokens)

    def embed_latent(self, latent):
        return self.latent_embed(latent)

    def step(self, x, position, kv: KvCache):
        """x [B, D] one embedded step at `position` [B] -> (cond, eos, kv')."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = x + jnp.take(self.pos_embed, jnp.clip(position, 0, KV_POSITIONS - 1),
                         axis=0).astype(dt)
        h = h[:, None, :]
        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks):
            h, k_i, v_i = blk(h, position, kv.k[i], kv.v[i])
            new_k.append(k_i)
            new_v.append(v_i)
        h = self.final_ln(h)[:, 0]
        cond = self.cond_head(h)
        eos = self.eos_head(h)[:, 0].astype(jnp.float32)
        return cond, eos, KvCache(jnp.stack(new_k), jnp.stack(new_v))

    def __call__(self, x, position, kv: KvCache):
        # init path: touch every submodule so flax materializes all params
        _ = self.text_embed(jnp.zeros((1,), jnp.int32))
        _ = self.latent_embed(jnp.zeros((1, LATENT_DIM)))
        return self.step(x, position, kv)


class _KvBlock(nn.Module):
    cfg: PocketTtsConfig

    @nn.compact
    def __call__(self, x, position, k_cache, v_cache):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B = x.shape[0]
        H, Dh = cfg.n_heads, cfg.head_dim
        h = nn.LayerNorm(dtype=dt, name="ln")(x)
        q = nn.Dense(cfg.d_model, dtype=dt, name="q")(h).reshape(B, 1, H, Dh)
        k_new = nn.Dense(cfg.d_model, dtype=dt, name="k")(h)[:, 0].reshape(B, H, Dh)
        v_new = nn.Dense(cfg.d_model, dtype=dt, name="v")(h)[:, 0].reshape(B, H, Dh)
        k_i = jax.vmap(lambda c, kn, p: c.at[p].set(kn))(k_cache, k_new, position)
        v_i = jax.vmap(lambda c, vn, p: c.at[p].set(vn))(v_cache, v_new, position)
        causal = jnp.arange(KV_POSITIONS)[None, :] <= position[:, None]
        scores = jnp.einsum("bqhd,bshd->bhqs", q, k_i) / np.sqrt(Dh)
        scores = jnp.where(causal[:, None, None, :], scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        att = jnp.einsum("bhqs,bshd->bqhd", probs, v_i).reshape(B, 1, cfg.d_model)
        x = x + nn.Dense(cfg.d_model, dtype=dt, name="out")(att)
        f = nn.LayerNorm(dtype=dt, name="fln")(x)
        f = nn.Dense(cfg.d_model * 4, dtype=dt, name="ff1")(f)
        f = nn.gelu(f)
        x = x + nn.Dense(cfg.d_model, dtype=dt, name="ff2")(f)
        return x, k_i, v_i


class FlowDecoder(nn.Module):
    """8 fused Euler steps of a conditional velocity field -> 32-d latent."""

    cfg: PocketTtsConfig

    @nn.compact
    def __call__(self, cond: jax.Array, noise: jax.Array) -> jax.Array:
        """cond [B, D], noise [B, LATENT_DIM] -> latent [B, LATENT_DIM]."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        v1 = nn.Dense(cfg.d_model, dtype=dt, name="v1")
        v2 = nn.Dense(cfg.d_model, dtype=dt, name="v2")
        v3 = nn.Dense(LATENT_DIM, dtype=dt, name="v3")
        time_embed = nn.Dense(cfg.d_model, dtype=dt, name="time")

        z = noise.astype(dt)
        dt_step = 1.0 / EULER_STEPS
        for k in range(EULER_STEPS):
            t = jnp.full((z.shape[0], 1), k * dt_step, dt)
            h = v1(jnp.concatenate([z, cond], axis=-1)) + time_embed(t)
            h = nn.silu(h)
            h = nn.silu(v2(h))
            vel = v3(h)
            z = z + dt_step * vel
        return z.astype(jnp.float32)


class MimiStates(NamedTuple):
    tails: tuple[jax.Array, ...]  # per-conv carried left context


class MimiDecoder(nn.Module):
    """32-d latent -> 1920 samples with streaming conv tails (23 states in the
    reference; here one tail per conv stage)."""

    cfg: PocketTtsConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        chans = cfg.mimi_channels
        # upsample chain: frame latent -> [up x (conv + upsample)] -> samples
        self.proj = nn.Dense(chans[0] * 30, dtype=dt)  # 30 base steps/frame
        self.convs = [
            nn.Conv(c, (cfg.mimi_kernel,), padding="VALID", dtype=dt, name=f"conv{i}")
            for i, c in enumerate(chans)
        ]
        self.head = nn.Dense(1, dtype=dt)
        self.up_factors = self._factors(chans)

    @staticmethod
    def _factors(chans) -> tuple[int, ...]:
        # total upsample 1920/30 = 64 split across stages
        total = FRAME_SAMPLES // 30
        n = len(chans)
        base = int(round(total ** (1 / n)))
        factors = [base] * (n - 1)
        factors.append(max(1, total // int(np.prod(factors))))
        return tuple(factors)

    def init_states(self, batch: int) -> MimiStates:
        cfg = self.cfg
        pad = cfg.mimi_kernel - 1
        chans = (cfg.mimi_channels[0],) + tuple(cfg.mimi_channels[:-1])
        return MimiStates(
            tails=tuple(
                jnp.zeros((batch, pad, c), cfg.compute_dtype) for c in chans
            )
        )

    def __call__(self, latent: jax.Array, states: MimiStates):
        """latent [B, 32], states -> (samples [B, 1920], states')."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        B = latent.shape[0]
        x = self.proj(latent.astype(dt)).reshape(B, 30, cfg.mimi_channels[0])
        new_tails = []
        for conv, up, tail in zip(self.convs, self.up_factors, states.tails):
            x = jnp.repeat(x, up, axis=1)  # nearest-neighbor upsample
            full = jnp.concatenate([tail, x], axis=1)
            new_tails.append(full[:, -(cfg.mimi_kernel - 1):])
            x = nn.silu(conv(full))
        samples = jnp.tanh(self.head(x)[:, :, 0].astype(jnp.float32))
        # pad/trim to exactly FRAME_SAMPLES
        n = samples.shape[1]
        if n < FRAME_SAMPLES:
            samples = jnp.pad(samples, ((0, 0), (0, FRAME_SAMPLES - n)))
        else:
            samples = samples[:, :FRAME_SAMPLES]
        return samples, MimiStates(tails=tuple(new_tails))


class MimiEncoder(nn.Module):
    """Audio -> latent frames (voice cloning: mimi-encode a 1-30 s sample)."""

    cfg: PocketTtsConfig

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        """audio [B, N] @24 kHz -> latents [B, N // 1920, 32]."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, N = audio.shape
        frames = audio[:, : (N // FRAME_SAMPLES) * FRAME_SAMPLES].reshape(
            B, -1, FRAME_SAMPLES
        ).astype(dt)
        h = nn.Dense(cfg.d_model, dtype=dt, name="fc1")(frames)
        h = nn.silu(h)
        h = nn.Conv(cfg.d_model, (3,), padding="SAME", dtype=dt, name="ctx")(h)
        h = nn.silu(h)
        return nn.Dense(LATENT_DIM, dtype=dt, name="out")(h).astype(jnp.float32)
