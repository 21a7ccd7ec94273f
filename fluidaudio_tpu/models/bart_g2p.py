"""BART encoder-decoder for English G2P (reference G2PModel parity).

The reference's English OOV phonemizer is a small BART seq2seq run as two
CoreML programs (`TTS/G2P/G2PModel.swift:6`: grapheme ids -> BOS/EOS-framed
encode, greedy decode to phoneme ids). This is the upstream architecture
(HF `BartForConditionalGeneration`) in flax with exact semantics so
`convert/bart.py` can load the real checkpoints:

  - learned positional embeddings with BART's +2 offset
  - post-norm layers (residual -> LayerNorm), `layernorm_embedding`
    after token+position embeddings
  - attention scaling 1/sqrt(head_dim) applied to q (HF folds it there)
  - gelu activation, biased projections
  - lm_head = shared embedding transposed + final_logits_bias
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BartConfig:
    vocab_size: int = 100
    d_model: int = 256
    encoder_layers: int = 3
    decoder_layers: int = 3
    encoder_attention_heads: int = 4
    decoder_attention_heads: int = 4
    encoder_ffn_dim: int = 1024
    decoder_ffn_dim: int = 1024
    max_position_embeddings: int = 128
    scale_embedding: bool = False
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 2  # HF BART starts decode with EOS


BART_G2P_TEST = BartConfig(vocab_size=80, d_model=64, encoder_layers=2,
                           decoder_layers=2, encoder_attention_heads=4,
                           decoder_attention_heads=4, encoder_ffn_dim=128,
                           decoder_ffn_dim=128, max_position_embeddings=64)


class BartAttention(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, q_in, kv_in, mask):
        Dh = self.d_model // self.n_heads
        B, Tq, _ = q_in.shape
        Tk = kv_in.shape[1]
        q = nn.Dense(self.d_model, name="q_proj")(q_in) * (Dh ** -0.5)
        k = nn.Dense(self.d_model, name="k_proj")(kv_in)
        v = nn.Dense(self.d_model, name="v_proj")(kv_in)
        q = q.reshape(B, Tq, self.n_heads, Dh)
        k = k.reshape(B, Tk, self.n_heads, Dh)
        v = v.reshape(B, Tk, self.n_heads, Dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(scores.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(out)


class BartG2P(nn.Module):
    cfg: BartConfig = BART_G2P_TEST

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared")
        self.enc_pos = nn.Embed(cfg.max_position_embeddings + 2, cfg.d_model,
                                name="enc_pos")
        self.dec_pos = nn.Embed(cfg.max_position_embeddings + 2, cfg.d_model,
                                name="dec_pos")
        self.enc_emb_ln = nn.LayerNorm(name="enc_emb_ln")
        self.dec_emb_ln = nn.LayerNorm(name="dec_emb_ln")
        mk = lambda n, h: BartAttention(cfg.d_model, h, name=n)
        self.enc_layers = [
            {
                "attn": mk(f"enc{i}_attn", cfg.encoder_attention_heads),
                "attn_ln": nn.LayerNorm(name=f"enc{i}_attn_ln"),
                "fc1": nn.Dense(cfg.encoder_ffn_dim, name=f"enc{i}_fc1"),
                "fc2": nn.Dense(cfg.d_model, name=f"enc{i}_fc2"),
                "final_ln": nn.LayerNorm(name=f"enc{i}_final_ln"),
            }
            for i in range(cfg.encoder_layers)
        ]
        self.dec_layers = [
            {
                "self": mk(f"dec{i}_self", cfg.decoder_attention_heads),
                "self_ln": nn.LayerNorm(name=f"dec{i}_self_ln"),
                "cross": mk(f"dec{i}_cross", cfg.decoder_attention_heads),
                "cross_ln": nn.LayerNorm(name=f"dec{i}_cross_ln"),
                "fc1": nn.Dense(cfg.decoder_ffn_dim, name=f"dec{i}_fc1"),
                "fc2": nn.Dense(cfg.d_model, name=f"dec{i}_fc2"),
                "final_ln": nn.LayerNorm(name=f"dec{i}_final_ln"),
            }
            for i in range(cfg.decoder_layers)
        ]
        self.final_logits_bias = self.param(
            "final_logits_bias", nn.initializers.zeros, (self.cfg.vocab_size,)
        )

    def _embed(self, ids, pos_table, emb_ln):
        scale = np.sqrt(self.cfg.d_model) if self.cfg.scale_embedding else 1.0
        x = self.shared(ids) * scale
        pos = jnp.arange(ids.shape[1]) + 2  # BART's legacy offset
        return emb_ln(x + pos_table(pos)[None])

    def encode(self, enc_ids, enc_mask):
        x = self._embed(enc_ids, self.enc_pos, self.enc_emb_ln)
        m = enc_mask[:, None, None, :]
        for lyr in self.enc_layers:
            x = lyr["attn_ln"](x + lyr["attn"](x, x, m))
            x = lyr["final_ln"](x + lyr["fc2"](nn.gelu(lyr["fc1"](x), approximate=False)))
        return x

    def decode(self, enc_out, enc_mask, dec_ids):
        x = self._embed(dec_ids, self.dec_pos, self.dec_emb_ln)
        Td = dec_ids.shape[1]
        causal = jnp.tril(jnp.ones((Td, Td), bool))[None, None]
        cm = enc_mask[:, None, None, :]
        for lyr in self.dec_layers:
            x = lyr["self_ln"](x + lyr["self"](x, x, causal))
            x = lyr["cross_ln"](x + lyr["cross"](x, enc_out, cm))
            x = lyr["final_ln"](x + lyr["fc2"](nn.gelu(lyr["fc1"](x), approximate=False)))
        return x @ self.shared.embedding.T + self.final_logits_bias

    def __call__(self, enc_ids, enc_mask, dec_ids):
        return self.decode(self.encode(enc_ids, enc_mask), enc_mask, dec_ids)


def bart_greedy_decode(model: BartG2P, params, enc_ids, enc_mask,
                       max_steps: int = 32):
    """Batched greedy decode. HF BART generation starts with
    [decoder_start(=EOS), BOS] then samples; rows terminate at EOS.
    -> [B, max_steps] ids following the BOS."""
    cfg = model.cfg

    @jax.jit
    def run(params, enc_ids, enc_mask):
        enc_out = model.apply(params, enc_ids, enc_mask, method=model.encode)
        B = enc_ids.shape[0]
        dec = jnp.full((B, max_steps + 2), cfg.pad_token_id, jnp.int32)
        dec = dec.at[:, 0].set(cfg.decoder_start_token_id)
        dec = dec.at[:, 1].set(cfg.bos_token_id)
        done = jnp.zeros((B,), bool)

        def step(carry, t):
            dec, done = carry
            logits = model.apply(params, enc_out, enc_mask, dec[:, :-1],
                                 method=model.decode)
            tok = jnp.argmax(logits[:, t + 1], axis=-1).astype(jnp.int32)
            tok = jnp.where(done, cfg.pad_token_id, tok)
            dec = dec.at[:, t + 2].set(tok)
            done = done | (tok == cfg.eos_token_id)
            return (dec, done), None

        (dec, done), _ = jax.lax.scan(step, (dec, done), jnp.arange(max_steps))
        return dec[:, 2:]

    return run(params, enc_ids, enc_mask)
