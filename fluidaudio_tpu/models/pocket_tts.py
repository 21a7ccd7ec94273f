"""PocketTTS streaming autoregressive TTS (flow-matching LM + Mimi codec).

Real-architecture JAX equivalents of the reference's PocketTTS CoreML graphs
(`PocketTTS/Pipeline/PocketTtsSynthesizer.swift:142-287,498-707`,
`PocketTtsConstants.swift:4-62`, KV contract
`PocketTtsSynthesizer+KVCache.swift:10-30`):

  - cond_prefill / cond_step / flowlm_step: one decoder-only transformer
    (Kyutai flow-LM): d_model 1024, 16 heads x 64 (the reference's KV tensors
    are [2, 1, 512, 16, 64] per layer), 6 layers (6L packs; 24 for `*_24l`),
    RMSNorm, RoPE, gated-SiLU MLP; per-layer KV cache over 512 positions.
    Step output = final hidden state ("transformerOut" feeding the flow
    decoder) + EOS logit (threshold -4.0).
  - flow_decoder_fused: 8 Euler steps of a conditional velocity field
    (residual MLP over [latent, cond] with a sinusoidal time embedding) ->
    32-d acoustic latent per 80 ms frame; initial noise scaled by
    sqrt(temperature)=sqrt(0.7).
  - mimi_decoder / mimi encoder: the real Mimi codec, `models/mimi.py`
    (frame-rate transformer + causal SEANet, 23 streaming states).

TPU design: prefill is one jitted scan; the generation loop (flowlm -> flow
Euler -> mimi) is ONE `lax.scan` over max frames with an EOS done-mask — the
reference pays 3 CoreML calls per 80 ms frame, here zero host round-trips.

Weight layout matches `convert/pocket_tts.py` (Moshi-style transformer
checkpoint names).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.mimi import (  # noqa: F401  (re-exported)
    MIMI_TEST,
    FRAME_SAMPLES,
    MimiConfig,
    MimiDecoder,
    MimiEncoder,
)
from fluidaudio_tpu.models.mimi import _rope

SAMPLE_RATE = 24_000
LATENT_DIM = 32
KV_POSITIONS = 512
VOICE_PROMPT_FRAMES = 125
EOS_THRESHOLD = -4.0
EULER_STEPS = 8
TEMPERATURE = 0.7


@dataclass(frozen=True)
class PocketTtsConfig:
    vocab_size: int = 4001  # SentencePiece text tokens
    d_model: int = 1024
    n_layers: int = 6  # 24 for the `*_24l` packs
    n_heads: int = 16
    ff_hidden: int = 2816  # gated-SiLU hidden (2/3 * 4096 rounded to 256)
    flow_blocks: int = 4
    flow_hidden: int = 1024
    max_frames: int = 250  # 20 s per generate call
    mimi: MimiConfig = field(default_factory=MimiConfig)
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


POCKET_BASE = PocketTtsConfig()
POCKET_TEST = PocketTtsConfig(
    vocab_size=64, d_model=32, n_layers=2, n_heads=4, ff_hidden=48,
    flow_blocks=2, flow_hidden=24, max_frames=16, mimi=MIMI_TEST,
)


class KvCache(NamedTuple):
    k: jax.Array  # [L, B, KV_POSITIONS, H, Dh]
    v: jax.Array


def init_kv(cfg: PocketTtsConfig, batch: int) -> KvCache:
    shape = (cfg.n_layers, batch, KV_POSITIONS, cfg.n_heads, cfg.head_dim)
    return KvCache(jnp.zeros(shape, cfg.compute_dtype), jnp.zeros(shape, cfg.compute_dtype))


class _KvBlock(nn.Module):
    """Moshi-style transformer block: RMSNorm -> RoPE attention (KV cache) ->
    RMSNorm -> gated-SiLU MLP."""

    cfg: PocketTtsConfig

    @nn.compact
    def __call__(self, x, position, k_cache, v_cache):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B = x.shape[0]
        H, Dh = cfg.n_heads, cfg.head_dim

        h = nn.RMSNorm(epsilon=1e-5, dtype=dt, name="norm1")(x)
        qkv = nn.Dense(3 * cfg.d_model, use_bias=False, dtype=dt, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rope(q.reshape(B, 1, H, Dh), position[:, None])
        k_new = _rope(k.reshape(B, 1, H, Dh), position[:, None])[:, 0]
        v_new = v[:, 0].reshape(B, H, Dh)
        k_i = jax.vmap(lambda c, kn, p: c.at[p].set(kn))(k_cache, k_new, position)
        v_i = jax.vmap(lambda c, vn, p: c.at[p].set(vn))(v_cache, v_new, position)
        causal = jnp.arange(KV_POSITIONS)[None, :] <= position[:, None]
        scores = jnp.einsum("bqhd,bshd->bhqs", q, k_i) / np.sqrt(Dh)
        scores = jnp.where(causal[:, None, None, :], scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        att = jnp.einsum("bhqs,bshd->bqhd", probs, v_i).reshape(B, 1, cfg.d_model)
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=dt, name="out_proj")(att)

        f = nn.RMSNorm(epsilon=1e-5, dtype=dt, name="norm2")(x)
        g = nn.Dense(2 * cfg.ff_hidden, use_bias=False, dtype=dt, name="gate_in")(f)
        a, b = jnp.split(g, 2, axis=-1)
        f = nn.silu(a) * b
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=dt, name="gate_out")(f)
        return x, k_i, v_i


class FlowLm(nn.Module):
    """Decoder-only flow LM over [BOS | voice prompt latents | text tokens |
    generated latents]; step output = final hidden (flow conditioning) + EOS
    logit."""

    cfg: PocketTtsConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.text_embed = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dt)
        self.latent_embed = nn.Dense(cfg.d_model, use_bias=False, dtype=dt)
        self.bos = self.param("bos", nn.initializers.normal(0.02), (cfg.d_model,))
        self.blocks = [_KvBlock(cfg, name=f"blk{i}") for i in range(cfg.n_layers)]
        self.out_norm = nn.RMSNorm(epsilon=1e-5, dtype=dt)
        self.eos_head = nn.Dense(1, dtype=dt)

    def embed_text(self, tokens):
        return self.text_embed(tokens)

    def embed_latent(self, latent):
        return self.latent_embed(latent)

    def bos_embedding(self):
        return self.bos

    def step(self, x, position, kv: KvCache):
        """x [B, D] one embedded step at `position` [B] -> (hidden, eos, kv').

        Traced under f32-accurate matmuls: the flow LM carries a torch-
        parity contract that default TPU bf16 accumulation breaks; its
        per-frame FLOPs are negligible."""
        with jax.default_matmul_precision("highest"):
            return self._step_impl(x, position, kv)

    def _step_impl(self, x, position, kv: KvCache):
        h = x[:, None, :]
        new_k, new_v = [], []
        for i, blk in enumerate(self.blocks):
            h, k_i, v_i = blk(h, position, kv.k[i], kv.v[i])
            new_k.append(k_i)
            new_v.append(v_i)
        hidden = self.out_norm(h)[:, 0]
        eos = self.eos_head(hidden)[:, 0].astype(jnp.float32)
        return hidden, eos, KvCache(jnp.stack(new_k), jnp.stack(new_v))

    def __call__(self, x, position, kv: KvCache):
        # init path: touch every submodule so flax materializes all params
        _ = self.text_embed(jnp.zeros((1,), jnp.int32))
        _ = self.latent_embed(jnp.zeros((1, self.cfg.mimi.latent_dim)))
        return self.step(x, position, kv)


def _time_embed(t, dim):
    """Sinusoidal embedding of the flow time t in [0, 1]."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t * 1000.0 * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class FlowVelocity(nn.Module):
    """Conditional velocity field v(z, t | cond): residual MLP."""

    cfg: PocketTtsConfig

    @nn.compact
    def __call__(self, z, cond, t):
        cfg = self.cfg
        dt = cfg.compute_dtype
        te = _time_embed(t, cfg.flow_hidden).astype(dt)
        te = nn.Dense(cfg.flow_hidden, dtype=dt, name="time_proj")(te)
        h = nn.Dense(cfg.flow_hidden, dtype=dt, name="in_proj")(
            jnp.concatenate([z.astype(dt), cond.astype(dt)], axis=-1)
        )
        h = h + te
        for i in range(cfg.flow_blocks):
            r = nn.LayerNorm(dtype=dt, name=f"blk{i}_norm")(h)
            r = nn.Dense(cfg.flow_hidden, dtype=dt, name=f"blk{i}_fc1")(r)
            r = nn.silu(r)
            r = nn.Dense(cfg.flow_hidden, dtype=dt, name=f"blk{i}_fc2")(r)
            h = h + r
        return nn.Dense(cfg.mimi.latent_dim, dtype=dt, name="out_proj")(h)


class FlowDecoder(nn.Module):
    """flow_decoder_fused: 8 Euler steps baked in (reference converts the
    LSD Euler loop into the graph, `PocketTtsConstants.swift:26-34`)."""

    cfg: PocketTtsConfig

    @nn.compact
    def __call__(self, cond: jax.Array, noise: jax.Array) -> jax.Array:
        """cond [B, D], noise [B, latent_dim] ~ N(0,1) -> latent."""
        with jax.default_matmul_precision("highest"):
            return self._euler(cond, noise)

    def _euler(self, cond, noise):
        field_net = FlowVelocity(self.cfg, name="velocity")
        z = noise * np.sqrt(TEMPERATURE)
        h = 1.0 / EULER_STEPS
        for k in range(EULER_STEPS):
            t = jnp.full((z.shape[0], 1), k * h, jnp.float32)
            z = z + h * field_net(z, cond, t)
        return z.astype(jnp.float32)
