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

LFR_M = 7  # frames stacked
LFR_N = 6  # shift
N_MELS = 80
PROMPT_LEN = 4  # <|lang|><|task|><|itn|><|emo|> prefix slots


@dataclass(frozen=True)
class SenseVoiceConfig:
    vocab_size: int = 25_055
    d_model: int = 512
    n_layers: int = 50
    n_heads: int = 4
    ffn_dim: int = 2048
    fsmn_kernel: int = 11
    n_languages: int = 16
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def blank_id(self) -> int:
        return 0  # CTC blank at index 0 (FunASR convention)


SENSEVOICE_SMALL = SenseVoiceConfig()
SENSEVOICE_TEST = SenseVoiceConfig(
    vocab_size=64, d_model=64, n_layers=2, n_heads=4, ffn_dim=128, dtype="float32"
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
    cfg: SenseVoiceConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.LayerNorm(dtype=dt, name="att_ln")(x)
        att = nn.SelfAttention(num_heads=cfg.n_heads, dtype=dt, name="att")(
            h, mask=pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
        )
        # FSMN memory: depthwise conv over values, added to attention out
        mem = nn.Conv(
            cfg.d_model, (cfg.fsmn_kernel,), padding="SAME",
            feature_group_count=cfg.d_model, dtype=dt, name="fsmn",
        )(h * pad_mask[..., None].astype(dt))
        x = x + att + mem
        f = nn.LayerNorm(dtype=dt, name="ffn_ln")(x)
        f = nn.Dense(cfg.ffn_dim, dtype=dt, name="ffn1")(f)
        f = nn.relu(f)
        f = nn.Dense(cfg.d_model, dtype=dt, name="ffn2")(f)
        return x + f


class SenseVoiceEncoder(nn.Module):
    """(lfr [B, T, 560], lengths [B], lang_id [B]) -> CTC log-probs [B, P+T, V]."""

    cfg: SenseVoiceConfig = SENSEVOICE_SMALL

    @nn.compact
    def __call__(self, lfr, lengths, lang_ids):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, T, _ = lfr.shape
        x = nn.Dense(cfg.d_model, dtype=dt, name="input_proj")(lfr.astype(dt))

        prompt = self.param(
            "prompt_embed",
            nn.initializers.normal(0.02),
            (cfg.n_languages, PROMPT_LEN, cfg.d_model),
            jnp.float32,
        )
        pfx = prompt[lang_ids].astype(dt)  # [B, 4, D]
        x = jnp.concatenate([pfx, x], axis=1)  # [B, P+T, D]

        total = PROMPT_LEN + T
        pad_mask = jnp.arange(total)[None, :] < (lengths + PROMPT_LEN)[:, None]
        for i in range(cfg.n_layers):
            x = _SanmBlock(cfg, name=f"block{i}")(x, pad_mask)
        x = nn.LayerNorm(dtype=dt, name="final_ln")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=dt, name="ctc_head")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
