"""SenseVoice-style non-autoregressive multilingual ASR encoder (SANM + CTC).

Explicit JAX equivalent of the reference's SenseVoiceSmall CoreML graphs
(`SenseVoice/SenseVoiceManager.swift:4-40`): fp32 preprocessor -> 560-d LFR
features (7-frame stacking, shift 6, of 80-mel fbank + CMVN) -> SANM encoder
(self-attention with FSMN memory convs) + CTC head -> host greedy CTC ->
strip `<|lang|>...` tags.

The language/task prompt tokens occupy the first 4 frames of the encoder
input in the upstream model; represented here as learned prefix embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LFR_M = 7  # frames stacked
LFR_N = 6  # shift
N_MELS = 80
PROMPT_LEN = 4  # <|lang|><|event|><|emo|><|textnorm|> prefix slots

# FunASR SenseVoiceSmall special-token ids (rows of the 560-d embed table):
# languages {auto:0, zh:3, en:4, yue:7, ja:11, ko:12, nospeech:13},
# event query 1, emotion query 2, textnorm {withitn:14, woitn:15}
EVENT_TOKEN_ID = 1
EMO_TOKEN_ID = 2
TEXTNORM_WITHITN_ID = 14
TEXTNORM_WOITN_ID = 15


@dataclass(frozen=True)
class SenseVoiceConfig:
    vocab_size: int = 25_055
    d_model: int = 512
    n_layers: int = 50
    tp_blocks: int = 20  # timestamp-predictor SANM stack (FunASR tp_encoders)
    n_heads: int = 4
    ffn_dim: int = 2048
    fsmn_kernel: int = 11
    n_languages: int = 16
    n_special_tokens: int = 16  # embed-table rows (languages + queries)
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def blank_id(self) -> int:
        return 0  # CTC blank at index 0 (FunASR convention)


SENSEVOICE_SMALL = SenseVoiceConfig()
SENSEVOICE_TEST = SenseVoiceConfig(
    vocab_size=64, d_model=64, n_layers=2, tp_blocks=1, n_heads=4, ffn_dim=128,
    dtype="float32"
)


def lfr_stack(mel: jax.Array, mel_lengths: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, n_mels, T] -> LFR features [B, T', n_mels*LFR_M], lengths'.

    Low-frame-rate stacking: output t covers input frames [t*6, t*6+7) with
    edge replication (FunASR convention).
    """
    B, F, T = mel.shape
    x = jnp.transpose(mel, (0, 2, 1))  # [B, T, F]
    t_out = (T + LFR_N - 1) // LFR_N
    starts = jnp.arange(t_out) * LFR_N
    idx = starts[:, None] + jnp.arange(LFR_M)[None, :]  # [T', 7]
    idx = jnp.minimum(idx, T - 1)
    stacked = x[:, idx, :]  # [B, T', 7, F]
    out = stacked.reshape(B, t_out, LFR_M * F)
    out_lengths = jnp.minimum((mel_lengths + LFR_N - 1) // LFR_N, t_out).astype(jnp.int32)
    return out, out_lengths


class _SanmBlock(nn.Module):
    """FunASR EncoderLayerSANM (pre-norm): fused q/k/v projection, FSMN
    memory as a bias-free depthwise conv over the VALUE projection (added to
    the attention output), then a ReLU feed-forward. The first encoder layer
    (`encoders0.0`) has in_size 560 != d_model, so its attention residual is
    dropped (FunASR `if in_size == size` branch). Convertible key map in
    convert/sensevoice.py."""

    cfg: SenseVoiceConfig
    in_size: int  # 560 for block 0, d_model elsewhere

    @nn.compact
    def __call__(self, x, pad_mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.d_model, cfg.n_heads
        hd = D // H
        B, T, _ = x.shape

        h = nn.LayerNorm(dtype=dt, name="norm1")(x)
        qkv = nn.Dense(3 * D, dtype=dt, name="qkv")(h)  # linear_q_k_v
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # FSMN memory over the masked value projection
        vm = v * pad_mask[..., None].astype(dt)
        left = (cfg.fsmn_kernel - 1) // 2
        mem = nn.Conv(D, (cfg.fsmn_kernel,),
                      padding=((left, cfg.fsmn_kernel - 1 - left),),
                      feature_group_count=D, use_bias=False, dtype=dt,
                      name="fsmn")(vm)
        mem = mem * pad_mask[..., None].astype(dt)

        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd)
        vh = v.reshape(B, T, H, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        att_mask = pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
        scores = jnp.where(att_mask, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        att = jnp.einsum("bhts,bshd->bthd", probs, vh).reshape(B, T, D)
        att = nn.Dense(D, dtype=dt, name="out")(att) + mem

        x = att if self.in_size != cfg.d_model else x + att
        f = nn.LayerNorm(dtype=dt, name="norm2")(x)
        f = nn.Dense(cfg.ffn_dim, dtype=dt, name="ffn1")(f)
        f = nn.relu(f)
        f = nn.Dense(cfg.d_model, dtype=dt, name="ffn2")(f)
        return x + f


def _sinusoid_posenc(T: int, dim: int) -> jax.Array:
    """FunASR SinusoidalPositionEncoder: positions 1..T (1-indexed)."""
    pos = jnp.arange(1, T + 1, dtype=jnp.float32)
    half = dim // 2
    inv = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                  * -(np.log(10000.0) / (half - 1)))
    ang = pos[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)[:, :dim]


class SenseVoiceEncoder(nn.Module):
    """(lfr [B, T, 560], lengths [B], lang_id [B]) -> CTC log-probs [B, P+T, V].

    FunASR SenseVoiceSmall layout: 4 prompt embeddings ([lang, event, emo,
    textnorm] rows of the 560-d special-token table) are concatenated with
    the LFR features, scaled by sqrt(d_model) and summed with 1-indexed
    sinusoidal positions, then encoders0 (in 560) + (n_layers-1) SANM blocks,
    after_norm, the tp_encoders timestamp-predictor stack (tp_blocks SANM
    layers) + tp_norm — upstream FunASR runs the CTC head on the tp output,
    not on after_norm — and the CTC head."""

    cfg: SenseVoiceConfig = SENSEVOICE_SMALL

    @nn.compact
    def __call__(self, lfr, lengths, lang_ids):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, T, F_in = lfr.shape

        embed = self.param(
            "embed",
            nn.initializers.normal(0.02),
            (cfg.n_special_tokens, F_in),
            jnp.float32,
        )
        prompt_ids = jnp.stack(
            [lang_ids,
             jnp.full_like(lang_ids, EVENT_TOKEN_ID),
             jnp.full_like(lang_ids, EMO_TOKEN_ID),
             jnp.full_like(lang_ids, TEXTNORM_WOITN_ID)],
            axis=1,
        )  # [B, 4]
        pfx = embed[prompt_ids].astype(dt)  # [B, 4, 560]
        x = jnp.concatenate([pfx, lfr.astype(dt)], axis=1)  # [B, P+T, 560]

        total = PROMPT_LEN + T
        x = x * np.sqrt(cfg.d_model) + _sinusoid_posenc(total, F_in).astype(dt)[None]

        pad_mask = jnp.arange(total)[None, :] < (lengths + PROMPT_LEN)[:, None]
        x = _SanmBlock(cfg, in_size=F_in, name="block0")(x, pad_mask)
        for i in range(1, cfg.n_layers):
            x = _SanmBlock(cfg, in_size=cfg.d_model, name=f"block{i}")(x, pad_mask)
        x = nn.LayerNorm(dtype=dt, name="final_ln")(x)
        for i in range(cfg.tp_blocks):
            x = _SanmBlock(cfg, in_size=cfg.d_model, name=f"tp_block{i}")(x, pad_mask)
        x = nn.LayerNorm(dtype=dt, name="tp_norm")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=dt, name="ctc_head")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
