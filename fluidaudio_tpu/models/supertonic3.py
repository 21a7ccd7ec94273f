"""Supertonic-3 multilingual TTS (44.1 kHz, step-fed flow matching), TPU-native.

The reference runs Supertonic-3 as 4 opaque CoreML stages converted from the
upstream ONNX release
(`/root/reference/Sources/FluidAudio/TTS/Supertonic3/Pipeline/Synthesize/Supertonic3Synthesizer.swift:76-216`):
  duration_predictor(text_ids, text_mask, style_dp) -> duration [bsz] seconds
  text_encoder(text_ids, text_mask, style_ttl)      -> text_emb [bsz,256,128]
  vector_estimator(noisy_latent, text_emb, style_ttl, latent_mask, text_mask,
                   current_step, total_step)        -> denoised_latent (fed
                   back as noisy_latent for totalStep=8 iterations)
  vocoder(latent [bsz,144,L])                       -> wav [bsz, L*3072]

Shape contract pinned by `Supertonic3Constants.swift:14-59` (v1.7.3 tts.json):
latent channels = latent_dim(24) x chunk_compress(6) = 144; latent frame =
base_chunk_size(512) x 6 = 3072 samples (~69.6 ms); text T fixed at 128;
style_ttl [bsz,50,256]; style_dp [bsz,8,16]; latent_len =
ceil(dur * 44100 / 3072) (`Supertonic3LatentSampler.swift:24-71`).

Upstream ships ONNX only (no public torch source), so the internal block
structure here is a best-effort DiT-style re-design that honors every
published I/O contract: the estimator performs ONE flow step per call
(conditioned on current_step/total_step exactly like the fed-back CoreML
graph) and the vocoder decompresses the 6x chunk packing before a
transposed-conv upsampler. `convert/supertonic3.py` maps ONNX initializers
by name where they line up and reports the remainder.

TPU notes: every stage is a single jitted program over static buckets; the
8-step denoise loop runs under one jit (lax-unrolled), not 8 dispatches.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.kokoro import conv_transpose_1d

SAMPLE_RATE = 44_100
BASE_CHUNK = 512
CHUNK_COMPRESS = 6
LATENT_DIM = 24
LATENT_CH = LATENT_DIM * CHUNK_COMPRESS  # 144
SAMPLES_PER_LATENT = BASE_CHUNK * CHUNK_COMPRESS  # 3072
TEXT_T = 128  # textTFixed
TTL_STYLE_TOKENS, TTL_STYLE_DIM = 50, 256
DP_STYLE_TOKENS, DP_STYLE_DIM = 8, 16
TEXT_EMB_DIM = 256
DEFAULT_TOTAL_STEPS = 8


@dataclass(frozen=True)
class Supertonic3Config:
    vocab_size: int = 256  # unicode_indexer.json id space (checkpoint-derived)
    d_model: int = 256
    n_text_layers: int = 4
    n_est_layers: int = 6
    n_heads: int = 4
    est_width: int = 384
    voc_width: int = 192
    voc_rates: tuple[int, ...] = (8, 8, 8)  # 512x from decompressed frames
    text_t: int = TEXT_T
    max_latent: int = 256  # latent bucket (ANE buckets 128/256/512)
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


SUPERTONIC3_BASE = Supertonic3Config()
SUPERTONIC3_TEST = Supertonic3Config(
    vocab_size=64, d_model=32, n_text_layers=1, n_est_layers=1, n_heads=2,
    est_width=32, voc_width=16, voc_rates=(8, 8, 8), text_t=32, max_latent=16,
)


def latent_len_for_duration(duration_s: float) -> int:
    """`Supertonic3LatentSampler.sampleNoisyLatent` latent-length math."""
    wav_len = int(duration_s * SAMPLE_RATE)
    return 0 if wav_len == 0 else (wav_len + SAMPLES_PER_LATENT - 1) // SAMPLES_PER_LATENT


class StyleCross(nn.Module):
    """Cross-attention pooling over a style token bank [B, S, Ds]."""

    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, x, style):
        kv = nn.Dense(self.d_model, name="style_proj")(style)
        h = nn.LayerNorm(name="ln")(x)
        return x + nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, name="attn"
        )(h, kv)


class TransformerBlock(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(name="ln1")(x)
        x = x + nn.SelfAttention(num_heads=self.n_heads, name="attn")(h, mask=mask)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * self.d_model, name="ff1")(h)
        return x + nn.Dense(self.d_model, name="ff2")(nn.gelu(h))


class Supertonic3TextEncoder(nn.Module):
    """text_encoder stage: (text_ids [B,T], text_mask [B,T], style_ttl
    [B,50,256]) -> text_emb [B, TEXT_EMB_DIM, T]."""

    cfg: Supertonic3Config

    @nn.compact
    def __call__(self, ids, text_mask, style_ttl):
        cfg = self.cfg
        B, T = ids.shape
        safe = jnp.clip(ids, 0, cfg.vocab_size - 1)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed")(safe)
        x = x * (ids >= 0)[..., None]  # unknown scalars (-1) are masked out
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (cfg.text_t, cfg.d_model), jnp.float32)
        x = x + pos[:T][None]
        valid = text_mask > 0
        att = valid[:, None, None, :] & valid[:, None, :, None]
        for i in range(cfg.n_text_layers):
            x = TransformerBlock(cfg.d_model, cfg.n_heads, name=f"block{i}")(x, att)
            x = StyleCross(cfg.d_model, cfg.n_heads, name=f"style{i}")(x, style_ttl)
        x = nn.LayerNorm(name="out_ln")(x)
        x = nn.Dense(TEXT_EMB_DIM, name="out_proj")(x)
        x = x * valid[..., None]
        return jnp.transpose(x, (0, 2, 1))  # [B, 256, T]


class Supertonic3DurationPredictor(nn.Module):
    """duration_predictor stage: (text_ids, text_mask, style_dp [B,8,16]) ->
    duration [B] (seconds; host divides by speed, floor 0.05 —
    `Supertonic3Synthesizer.swift:110-113`)."""

    cfg: Supertonic3Config

    @nn.compact
    def __call__(self, ids, text_mask, style_dp):
        cfg = self.cfg
        B, T = ids.shape
        safe = jnp.clip(ids, 0, cfg.vocab_size - 1)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed")(safe)
        x = x * (ids >= 0)[..., None]
        valid = text_mask > 0
        s = nn.Dense(cfg.d_model, name="style_proj")(
            style_dp.reshape(B, -1)
        )[:, None, :]
        x = x + s
        for i in range(2):
            x = nn.Conv(cfg.d_model, (3,), padding=1, name=f"conv{i}")(x)
            x = nn.silu(x) * valid[..., None]
        att = valid[:, None, None, :] & valid[:, None, :, None]
        x = TransformerBlock(cfg.d_model, cfg.n_heads, name="block")(x, att)
        n = jnp.maximum(jnp.sum(valid, axis=1), 1)
        pooled = jnp.sum(x * valid[..., None], axis=1) / n[:, None]
        return jax.nn.softplus(nn.Dense(1, name="out")(pooled))[:, 0]


class _DiTBlock(nn.Module):
    """adaLN-zero DiT block: self-attn over latent frames + cross-attn to
    text tokens, both modulated by the step embedding."""

    width: int
    n_heads: int

    @nn.compact
    def __call__(self, x, t_emb, ctx, self_mask, ctx_mask):
        m = nn.Dense(6 * self.width, name="mod",
                     kernel_init=nn.initializers.zeros)(nn.silu(t_emb))
        s1, b1, g1, s2, b2, g2 = jnp.split(m[:, None, :], 6, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="ln1")(x)
        h = h * (1 + s1) + b1
        x = x + g1 * nn.SelfAttention(num_heads=self.n_heads, name="attn")(h, mask=self_mask)
        h = nn.LayerNorm(name="ln_c")(x)
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, name="cross"
        )(h, ctx, mask=ctx_mask)
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="ln2")(x)
        h = h * (1 + s2) + b2
        h = nn.Dense(4 * self.width, name="ff1")(h)
        return x + g2 * nn.Dense(self.width, name="ff2")(nn.gelu(h))


class Supertonic3VectorEstimator(nn.Module):
    """vector_estimator stage: ONE flow step per call (the reference feeds
    the output back as `noisy_latent`, `Supertonic3Synthesizer.swift:163-187`).

    (noisy_latent [B,144,L], text_emb [B,256,T], style_ttl [B,50,256],
     latent_mask [B,1,L], text_mask [B,1,T], current_step [B], total_step [B])
    -> denoised_latent [B,144,L] = x + (1/total) * v(x, t).
    """

    cfg: Supertonic3Config

    @nn.compact
    def __call__(self, noisy_latent, text_emb, style_ttl, latent_mask,
                 text_mask, current_step, total_step):
        cfg = self.cfg
        w = cfg.est_width
        B = noisy_latent.shape[0]
        x = jnp.transpose(noisy_latent, (0, 2, 1))  # [B, L, 144]
        L = x.shape[1]
        x = nn.Dense(w, name="in_proj")(x)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (cfg.max_latent, w), jnp.float32)
        x = x + pos[:L][None]

        # timestep embedding: t = current/total in [0,1)
        t = (current_step / jnp.maximum(total_step, 1.0))[:, None]
        half = w // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
        te = jnp.concatenate([jnp.sin(t * freqs * 1000.0),
                              jnp.cos(t * freqs * 1000.0)], axis=-1)
        t_emb = nn.Dense(w, name="t2")(nn.silu(nn.Dense(w, name="t1")(te)))

        ctx_txt = nn.Dense(w, name="ctx_proj")(jnp.transpose(text_emb, (0, 2, 1)))
        ctx_sty = nn.Dense(w, name="sty_proj")(style_ttl)
        ctx = jnp.concatenate([ctx_txt, ctx_sty], axis=1)  # [B, T+50, w]
        tmask = text_mask[:, 0, :] > 0
        ctx_valid = jnp.concatenate(
            [tmask, jnp.ones((B, style_ttl.shape[1]), bool)], axis=1
        )
        lvalid = latent_mask[:, 0, :] > 0
        self_mask = lvalid[:, None, None, :] & lvalid[:, None, :, None]
        ctx_mask = lvalid[:, None, :, None] & ctx_valid[:, None, None, :]

        for i in range(cfg.n_est_layers):
            x = _DiTBlock(w, cfg.n_heads, name=f"block{i}")(
                x, t_emb, ctx, self_mask, ctx_mask
            )
        x = nn.LayerNorm(name="out_ln")(x)
        v = nn.Dense(LATENT_CH, name="out_proj",
                     kernel_init=nn.initializers.zeros)(x)
        v = jnp.transpose(v, (0, 2, 1)) * latent_mask  # [B, 144, L]
        dt = (1.0 / jnp.maximum(total_step, 1.0))[:, None, None]
        return noisy_latent + dt * v


class _SnakeResBlock(nn.Module):
    channels: int
    kernel: int = 3
    dilations: tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            a = self.param(f"alpha{i}", nn.initializers.ones, (1, 1, self.channels))
            h = x + (1.0 / a) * jnp.sin(a * x) ** 2
            pad = (self.kernel * d - d) // 2
            h = nn.Conv(self.channels, (self.kernel,), kernel_dilation=(d,),
                        padding=pad, name=f"conv{i}")(h)
            x = x + h
        return x


class Supertonic3Vocoder(nn.Module):
    """vocoder stage: latent [B,144,L] -> wav [B, L*3072].

    Decompresses the 6x chunk packing (144 -> [B, 6L, 24]), then a
    transposed-conv upsampler (8*8*8 = 512x) with snake resblocks."""

    cfg: Supertonic3Config

    @nn.compact
    def __call__(self, latent):
        cfg = self.cfg
        B, C, L = latent.shape
        x = jnp.transpose(latent, (0, 2, 1))  # [B, L, 144]
        x = x.reshape(B, L * CHUNK_COMPRESS, LATENT_DIM)  # un-pack 6x
        ch = cfg.voc_width
        x = nn.Conv(ch, (7,), padding=3, name="pre")(x)
        for i, r in enumerate(cfg.voc_rates):
            c_out = max(ch // 2, 8)
            k = 2 * r
            kern = self.param(f"up_kernel_{i}", nn.initializers.lecun_normal(),
                              (k, ch, c_out))
            b = self.param(f"up_bias_{i}", nn.initializers.zeros, (c_out,))
            x = conv_transpose_1d(
                nn.leaky_relu(x, 0.1), kern, r, (k - r) // 2
            ) + b
            x = _SnakeResBlock(c_out, name=f"res{i}")(x)
            ch = c_out
        x = nn.Conv(1, (7,), padding=3, name="post")(x)
        wav = jnp.tanh(x[..., 0])
        want = L * SAMPLES_PER_LATENT
        if wav.shape[1] > want:
            wav = wav[:, :want]
        elif wav.shape[1] < want:
            wav = jnp.pad(wav, ((0, 0), (0, want - wav.shape[1])))
        return wav


def sample_noisy_latent(
    durations_s: np.ndarray, max_latent: int, rng: np.random.RandomState
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host-side parity with `Supertonic3LatentSampler.sampleNoisyLatent`:
    Gaussian latent [B,144,Lb] zeroed past each row's latent length, float
    mask [B,1,Lb], true max length. `Lb` is the static bucket."""
    durations_s = np.asarray(durations_s, np.float32).reshape(-1)
    B = durations_s.shape[0]
    lens = np.array([latent_len_for_duration(float(d)) for d in durations_s])
    true_len = int(lens.max()) if len(lens) else 0
    Lb = max_latent
    z = rng.randn(B, LATENT_CH, Lb).astype(np.float32)
    mask = (np.arange(Lb)[None, :] < lens[:, None]).astype(np.float32)
    z *= mask[:, None, :]
    return z, mask[:, None, :], min(true_len, Lb)
