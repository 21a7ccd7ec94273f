"""Byte-level G2P seq2seq (charsiu ByT5 / BART analog).

Explicit JAX equivalent of the reference's G2P CoreML graphs
(`G2P/G2PModel.swift:6` BART encoder/decoder actor singleton;
`G2P/MultilingualG2PModel.swift:9` ByT5 CharsiuG2P with a language prefix):
word bytes in -> IPA codepoint ids out, greedy decode. Words are short
(<=32 bytes in, <=48 phonemes out) so the decoder recomputes attention over
the emitted prefix each step inside one `lax.scan` — simpler than a KV cache
at this size and still a single device call per word batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MAX_WORD_BYTES = 32
MAX_PHONEMES = 48
BOS, EOS, PAD = 1, 2, 0


@dataclass(frozen=True)
class G2pConfig:
    byte_vocab: int = 384  # 256 bytes + language prefix tokens + specials
    phoneme_vocab: int = 256  # IPA codepoint table
    d_model: int = 256
    n_layers: int = 3
    n_heads: int = 4
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


G2P_BASE = G2pConfig()
G2P_TEST = G2pConfig(d_model=32, n_layers=1, n_heads=4, byte_vocab=300,
                     phoneme_vocab=64)


class G2pSeq2Seq(nn.Module):
    cfg: G2pConfig = G2P_BASE

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.src_embed = nn.Embed(cfg.byte_vocab, cfg.d_model, dtype=dt)
        self.tgt_embed = nn.Embed(cfg.phoneme_vocab, cfg.d_model, dtype=dt)
        self.src_pos = self.param("src_pos", nn.initializers.normal(0.02),
                                  (MAX_WORD_BYTES, cfg.d_model), jnp.float32)
        self.tgt_pos = self.param("tgt_pos", nn.initializers.normal(0.02),
                                  (MAX_PHONEMES, cfg.d_model), jnp.float32)
        self.enc_blocks = [
            (nn.LayerNorm(dtype=dt), nn.SelfAttention(num_heads=cfg.n_heads, dtype=dt),
             nn.LayerNorm(dtype=dt), nn.Dense(cfg.d_model * 4, dtype=dt),
             nn.Dense(cfg.d_model, dtype=dt))
            for _ in range(cfg.n_layers)
        ]
        self.dec_blocks = [
            (nn.LayerNorm(dtype=dt), nn.SelfAttention(num_heads=cfg.n_heads, dtype=dt),
             nn.LayerNorm(dtype=dt),
             nn.MultiHeadDotProductAttention(num_heads=cfg.n_heads, dtype=dt),
             nn.LayerNorm(dtype=dt), nn.Dense(cfg.d_model * 4, dtype=dt),
             nn.Dense(cfg.d_model, dtype=dt))
            for _ in range(cfg.n_layers)
        ]
        self.final_ln = nn.LayerNorm(dtype=dt)
        self.head = nn.Dense(cfg.phoneme_vocab, dtype=dt)

    def encode(self, bytes_in, lengths):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, N = bytes_in.shape
        x = self.src_embed(bytes_in) + self.src_pos[:N][None].astype(dt)
        valid = jnp.arange(N)[None, :] < lengths[:, None]
        att = valid[:, None, None, :] & valid[:, None, :, None]
        for ln1, sa, ln2, ff1, ff2 in self.enc_blocks:
            x = x + sa(ln1(x), mask=att)
            x = x + ff2(nn.gelu(ff1(ln2(x))))
        return x, valid

    def decode_logits(self, tgt_tokens, enc, enc_valid):
        """Teacher-forced logits over the whole target prefix."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, M = tgt_tokens.shape
        y = self.tgt_embed(tgt_tokens) + self.tgt_pos[:M][None].astype(dt)
        causal = jnp.tril(jnp.ones((M, M), bool))[None, None]
        cross = enc_valid[:, None, None, :]
        for ln1, sa, ln2, ca, ln3, ff1, ff2 in self.dec_blocks:
            y = y + sa(ln1(y), mask=causal)
            y = y + ca(ln2(y), enc, mask=jnp.broadcast_to(cross, (B, 1, M, enc.shape[1])))
            y = y + ff2(nn.gelu(ff1(ln3(y))))
        return self.head(self.final_ln(y)).astype(jnp.float32)

    def __call__(self, bytes_in, lengths, tgt_tokens):
        enc, enc_valid = self.encode(bytes_in, lengths)
        return self.decode_logits(tgt_tokens, enc, enc_valid)


def g2p_greedy_decode(model: G2pSeq2Seq, params, bytes_in, lengths):
    """Greedy decode: returns (phoneme ids [B, MAX_PHONEMES], counts [B])."""

    def run(params, bytes_in, lengths):
        enc, enc_valid = model.apply(params, bytes_in, lengths, method=G2pSeq2Seq.encode)
        B = bytes_in.shape[0]

        def step(carry, _):
            tokens, pos, done = carry
            logits = model.apply(
                params, tokens, enc, enc_valid, method=G2pSeq2Seq.decode_logits
            )  # [B, M, V]
            nxt = jnp.take_along_axis(
                jnp.argmax(logits, axis=-1).astype(jnp.int32), jnp.maximum(pos - 1, 0)[:, None], axis=1
            )[:, 0]
            nxt = jnp.where(done, PAD, nxt)
            tokens = jax.vmap(lambda row, p, t: row.at[p].set(t))(tokens, pos, nxt)
            done = done | (nxt == EOS)
            pos = jnp.where(done, pos, pos + 1)
            return (tokens, pos, done), None

        tokens0 = jnp.full((B, MAX_PHONEMES), PAD, jnp.int32).at[:, 0].set(BOS)
        init = (tokens0, jnp.ones((B,), jnp.int32), jnp.zeros((B,), bool))
        (tokens, pos, _), _ = jax.lax.scan(step, init, None, length=MAX_PHONEMES - 1)
        return tokens, pos

    return jax.jit(run)(params, bytes_in, lengths)


def encode_word(word: str, language_prefix: int | None = None) -> tuple[np.ndarray, int]:
    """Word -> byte id row [MAX_WORD_BYTES] (+ optional language token)."""
    ids = []
    if language_prefix is not None:
        ids.append(256 + language_prefix)
    ids.extend(b + 3 for b in word.encode("utf-8")[: MAX_WORD_BYTES - len(ids)])
    row = np.zeros(MAX_WORD_BYTES, np.int32)
    row[: len(ids)] = ids[:MAX_WORD_BYTES]
    return row, len(ids)
