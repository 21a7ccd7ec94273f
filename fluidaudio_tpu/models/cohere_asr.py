"""Cohere Transcribe encoder-decoder multilingual ASR (14 languages).

Explicit JAX equivalent of the reference's Cohere CoreML graphs at the
documented dimensions (`Cohere/CohereAsrConfig.swift:25-60`): Conformer
encoder hidden 1280 x 48 layers over a 128-mel/35 s input (mel: preemph 0.97,
n_fft 512, hop 160, fmax 8000, natural-log + CMVN ddof=1,
`CohereMelSpectrogram`), transformer decoder hidden 1024, 8 heads x 128
head-dim, 8 layers, EXTERNAL KV cache over maxSeqLen=108 positions
(`CoherePipeline.swift:690-715` cache shape), additive -1e4 cross-attn pad
mask, vocab 16384, special tokens unk=0/noSpeech=1/pad=2/eos=3/start=4/
pnc=5/startOfContext=7; greedy decode with repetition penalty +
no-repeat-ngram; long-form = 35 s windows with 5 s overlap
(`CohereAsrConfig.chunkOverlapSeconds`).

TPU design: the whole greedy decode (prefill + token loop) is one
`lax.while_loop` with the KV caches as carried [L, B, max_len, H, Dh] arrays —
the reference pays one CoreML call per generated token. The Conformer
encoder is the shared `models/conformer.py` trunk at the Cohere width.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CohereConfig:
    # documented dims: CohereAsrConfig.swift:25-60
    vocab_size: int = 16_384
    enc_hidden: int = 1280
    n_encoder_layers: int = 48
    n_enc_heads: int = 8
    d_model: int = 1024  # decoder hidden
    n_heads: int = 8  # decoder heads (head_dim 128)
    n_decoder_layers: int = 8
    n_mels: int = 128
    max_audio_frames: int = 3500  # 35 s at 10 ms hop
    max_decode_tokens: int = 108  # CohereAsrConfig.maxSeqLen
    bos_id: int = 4  # startToken
    eos_id: int = 3  # eosToken
    pad_id: int = 2
    no_speech_id: int = 1
    repetition_penalty: float = 1.3
    no_repeat_ngram: int = 3
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# the 14 supported locales (reference `CohereAsrConfig.Language`,
# ISO-639-1 code -> English name)
COHERE_LANGUAGES = {
    "en": "English", "fr": "French", "de": "German", "es": "Spanish",
    "it": "Italian", "pt": "Portuguese", "nl": "Dutch", "pl": "Polish",
    "el": "Greek", "ar": "Arabic", "ja": "Japanese", "zh": "Chinese",
    "vi": "Vietnamese", "ko": "Korean",
}

COHERE_BASE = CohereConfig()
COHERE_TEST = CohereConfig(
    vocab_size=64, enc_hidden=32, n_encoder_layers=2, n_enc_heads=4,
    d_model=32, n_heads=4, n_decoder_layers=2,
    n_mels=16, max_audio_frames=64, max_decode_tokens=16, dtype="float32",
)


class CohereEncoder(nn.Module):
    """Conformer encoder at the Cohere width (shared trunk,
    `models/conformer.py`): mel [B, n_mels, T] -> (enc [B, T', 1280], mask)."""

    cfg: CohereConfig

    @nn.compact
    def __call__(self, mel: jax.Array, mel_lengths: jax.Array):
        from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder

        cfg = self.cfg
        ccfg = ConformerConfig(
            n_mels=cfg.n_mels,
            d_model=cfg.enc_hidden,
            n_layers=cfg.n_encoder_layers,
            n_heads=cfg.n_enc_heads,
            subsampling_channels=max(32, cfg.enc_hidden // 8),
            dtype=cfg.dtype,
        )
        enc, enc_lengths = ConformerEncoder(ccfg, name="conformer")(mel, mel_lengths)
        mask = jnp.arange(enc.shape[1])[None, :] < enc_lengths[:, None]
        return enc, mask


class CohereDecoderStep(nn.Module):
    """One decoder step with external KV cache (token t attends cache[0..t])."""

    cfg: CohereConfig

    @nn.compact
    def __call__(self, token, position, k_cache, v_cache, enc, enc_mask):
        """token [B] int32, position [B] int32,
        k/v_cache [L, B, max_len, H, Dh] -> (logits [B, V], new k/v)."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        B = token.shape[0]
        H, Dh = cfg.n_heads, cfg.head_dim
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dt, name="embed")
        pos_emb = self.param("pos_embed", nn.initializers.normal(0.02),
                             (cfg.max_decode_tokens, cfg.d_model), jnp.float32)
        x = emb(token) + jnp.take(pos_emb, jnp.clip(position, 0, cfg.max_decode_tokens - 1),
                                  axis=0).astype(dt)  # [B, D]
        x = x[:, None, :]  # [B, 1, D]

        new_k, new_v = [], []
        causal = (
            jnp.arange(cfg.max_decode_tokens)[None, :] <= position[:, None]
        )  # [B, max_len]
        for i in range(cfg.n_decoder_layers):
            h = nn.LayerNorm(dtype=dt, name=f"sln{i}")(x)
            q = nn.Dense(cfg.d_model, dtype=dt, name=f"q{i}")(h).reshape(B, 1, H, Dh)
            k_new = nn.Dense(cfg.d_model, dtype=dt, name=f"k{i}")(h).reshape(B, H, Dh)
            v_new = nn.Dense(cfg.d_model, dtype=dt, name=f"v{i}")(h).reshape(B, H, Dh)
            k_i = jax.vmap(lambda cache, kn, p: cache.at[p].set(kn))(
                k_cache[i], k_new, position
            )
            v_i = jax.vmap(lambda cache, vn, p: cache.at[p].set(vn))(
                v_cache[i], v_new, position
            )
            scores = jnp.einsum("bqhd,bshd->bhqs", q, k_i) / np.sqrt(Dh)
            scores = jnp.where(causal[:, None, None, :], scores, jnp.finfo(dt).min)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
            att = jnp.einsum("bhqs,bshd->bqhd", probs, v_i).reshape(B, 1, cfg.d_model)
            x = x + nn.Dense(cfg.d_model, dtype=dt, name=f"so{i}")(att)

            # cross attention (additive -1e4 pad mask like the reference)
            h = nn.LayerNorm(dtype=dt, name=f"cln{i}")(x)
            qc = nn.Dense(cfg.d_model, dtype=dt, name=f"cq{i}")(h).reshape(B, 1, H, Dh)
            kc = nn.Dense(cfg.d_model, dtype=dt, name=f"ck{i}")(enc).reshape(
                B, enc.shape[1], H, Dh
            )
            vc = nn.Dense(cfg.d_model, dtype=dt, name=f"cv{i}")(enc).reshape(
                B, enc.shape[1], H, Dh
            )
            cs = jnp.einsum("bqhd,bshd->bhqs", qc, kc) / np.sqrt(Dh)
            cs = cs + jnp.where(enc_mask[:, None, None, :], 0.0, -1e4).astype(cs.dtype)
            cp = jax.nn.softmax(cs.astype(jnp.float32), axis=-1).astype(dt)
            catt = jnp.einsum("bhqs,bshd->bqhd", cp, vc).reshape(B, 1, cfg.d_model)
            x = x + nn.Dense(cfg.d_model, dtype=dt, name=f"co{i}")(catt)

            f = nn.LayerNorm(dtype=dt, name=f"fln{i}")(x)
            f = nn.Dense(cfg.d_model * 4, dtype=dt, name=f"ff1_{i}")(f)
            f = nn.gelu(f)
            x = x + nn.Dense(cfg.d_model, dtype=dt, name=f"ff2_{i}")(f)
            new_k.append(k_i)
            new_v.append(v_i)

        x = nn.LayerNorm(dtype=dt, name="final_ln")(x)
        logits = (x[:, 0] @ emb.embedding.T.astype(dt)).astype(jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)


class CohereDecodeResult(NamedTuple):
    tokens: jax.Array  # [B, max_decode_tokens]
    counts: jax.Array  # [B]


def cohere_greedy_decode(
    cfg: CohereConfig,
    step_fn,  # (token, position, k, v, enc, enc_mask) -> (logits, k, v)
    enc: jax.Array,
    enc_mask: jax.Array,
) -> CohereDecodeResult:
    """Greedy AR decode with repetition penalty + no-repeat-ngram ban."""
    B = enc.shape[0]
    L, H, Dh = cfg.n_decoder_layers, cfg.n_heads, cfg.head_dim
    M = cfg.max_decode_tokens
    k0 = jnp.zeros((L, B, M, H, Dh), cfg.compute_dtype)
    v0 = jnp.zeros_like(k0)

    class Carry(NamedTuple):
        pos: jax.Array
        token: jax.Array
        k: jax.Array
        v: jax.Array
        out: jax.Array
        done: jax.Array

    init = Carry(
        pos=jnp.zeros((B,), jnp.int32),
        token=jnp.full((B,), cfg.bos_id, jnp.int32),
        k=k0,
        v=v0,
        out=jnp.full((B, M), cfg.eos_id, jnp.int32),
        done=jnp.zeros((B,), bool),
    )

    def cond(c: Carry):
        return jnp.any(~c.done) & jnp.all(c.pos < M - 1)

    def body(c: Carry):
        logits, k, v = step_fn(c.token, c.pos, c.k, c.v, enc, enc_mask)
        # repetition penalty on already-emitted tokens
        emitted = jax.vmap(
            lambda row, p: jnp.zeros((cfg.vocab_size,), bool)
            .at[row]
            .set(jnp.arange(M) < p)
        )(c.out, c.pos)
        penalized = jnp.where(
            logits > 0, logits / cfg.repetition_penalty, logits * cfg.repetition_penalty
        )
        logits = jnp.where(emitted, penalized, logits)
        # no-repeat-ngram: ban the token that would complete a repeated n-gram
        if cfg.no_repeat_ngram >= 2:
            n = cfg.no_repeat_ngram

            def banned_mask(row, p):
                # context = last n-1 emitted tokens
                ctx_idx = jnp.clip(p - (n - 1) + jnp.arange(n - 1), 0, M - 1)
                ctx = row[ctx_idx]  # [n-1]
                # candidate position j: ngram row[j..j+n-2] == ctx -> ban row[j+n-1]
                starts = jnp.arange(M)
                win = jnp.clip(starts[:, None] + jnp.arange(n - 1)[None, :], 0, M - 1)
                grams = row[win]  # [M, n-1]
                match = jnp.all(grams == ctx[None, :], axis=1)
                match &= (starts + n - 1) < p  # completed ngrams only
                nxt = row[jnp.clip(starts + n - 1, 0, M - 1)]
                mask = jnp.zeros((cfg.vocab_size,), bool)
                return mask.at[nxt].max(match)

            banned = jax.vmap(banned_mask)(c.out, c.pos)
            logits = jnp.where(banned & (c.pos >= (n - 1))[:, None], -1e9, logits)

        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(c.done, cfg.eos_id, nxt)
        out = jax.vmap(lambda row, p, t: row.at[p].set(t))(c.out, c.pos, nxt)
        done = c.done | (nxt == cfg.eos_id)
        pos = jnp.where(c.done, c.pos, c.pos + 1)
        return Carry(pos, nxt, k, v, out, done)

    final = jax.lax.while_loop(cond, body, init)
    return CohereDecodeResult(tokens=final.out, counts=final.pos)
