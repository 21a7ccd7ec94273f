"""ByT5 encoder-decoder for multilingual G2P (CharsiuG2P parity).

The reference's multilingual phonemizer is the CharsiuG2P ByT5 CoreML pair
(`TTS/G2P/MultilingualG2PModel.swift:9`: byte-level T5, per-language
"<lang>: " prompt, greedy decode). This is the upstream architecture in
flax with exact T5-v1.1 semantics so `convert/byt5.py` can load the real
HF checkpoints:

  - T5LayerNorm = RMS norm (no mean subtraction, no bias), eps 1e-6
  - attention without 1/sqrt(d_kv) scaling (T5 folds it into init)
  - relative position bias only on the FIRST self-attention layer of the
    encoder and of the decoder, shared by the rest (HF
    `has_relative_attention_bias = bool(i == 0)`)
  - gated-GELU feed-forward (wi_0 gate * wi_1) with "gelu_new" (tanh) GELU
  - untied lm_head (ByT5 unties embeddings => no d_model**-0.5 logits
    rescale, HF `T5ForConditionalGeneration.forward`)

Byte tokenizer: ByT5 ids = utf-8 byte + 3 (0=pad, 1=eos, 2=unk); prompts
are plain text ("<eng-us>: word") exactly as CharsiuG2P expects.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PAD_ID = 0
EOS_ID = 1


@dataclass(frozen=True)
class ByT5Config:
    vocab_size: int = 384
    d_model: int = 1472
    d_kv: int = 64
    d_ff: int = 3584
    num_layers: int = 12
    num_decoder_layers: int = 4
    num_heads: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    tie_word_embeddings: bool = False


# charsiu/g2p_multilingual_byT5_small_100 uses the stock byt5-small dims
BYT5_SMALL = ByT5Config()
BYT5_TEST = ByT5Config(
    vocab_size=384, d_model=64, d_kv=16, d_ff=128, num_layers=2,
    num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
    relative_attention_max_distance=20,
)


def _gelu_new(x):
    # HF "gelu_new": tanh approximation
    return 0.5 * x * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))
    ))


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w


def relative_position_bucket(rel_pos, *, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF `T5Attention._relative_position_bucket` (exact)."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: ByT5Config
    has_relative_bias: bool = False
    bidirectional: bool = True

    @nn.compact
    def __call__(self, q_in, kv_in, mask, position_bias=None):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        B, Tq, _ = q_in.shape
        Tk = kv_in.shape[1]
        q = nn.Dense(inner, use_bias=False, name="q")(q_in)
        k = nn.Dense(inner, use_bias=False, name="k")(kv_in)
        v = nn.Dense(inner, use_bias=False, name="v")(kv_in)
        q = q.reshape(B, Tq, cfg.num_heads, cfg.d_kv)
        k = k.reshape(B, Tk, cfg.num_heads, cfg.d_kv)
        v = v.reshape(B, Tk, cfg.num_heads, cfg.d_kv)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)  # NO 1/sqrt(d_kv)
        if self.has_relative_bias:
            ctx = jnp.arange(Tq)[:, None]
            mem = jnp.arange(Tk)[None, :]
            buckets = relative_position_bucket(
                mem - ctx, bidirectional=self.bidirectional,
                num_buckets=cfg.relative_attention_num_buckets,
                max_distance=cfg.relative_attention_max_distance,
            )
            table = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                             name="relative_attention_bias")(buckets)  # [Tq,Tk,H]
            position_bias = table.transpose(2, 0, 1)[None]  # [1,H,Tq,Tk]
        if position_bias is not None:
            scores = scores + position_bias
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, inner)
        return nn.Dense(cfg.d_model, use_bias=False, name="o")(out), position_bias


class T5FFN(nn.Module):
    cfg: ByT5Config

    @nn.compact
    def __call__(self, x):
        gate = _gelu_new(nn.Dense(self.cfg.d_ff, use_bias=False, name="wi_0")(x))
        lin = nn.Dense(self.cfg.d_ff, use_bias=False, name="wi_1")(x)
        return nn.Dense(self.cfg.d_model, use_bias=False, name="wo")(gate * lin)


class ByT5G2P(nn.Module):
    """T5 stack; `__call__(enc_ids, enc_mask, dec_ids)` -> decoder logits."""

    cfg: ByT5Config = BYT5_SMALL

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared")
        self.enc_blocks = [
            {
                "attn_ln": T5LayerNorm(cfg.layer_norm_epsilon, name=f"enc{i}_attn_ln"),
                "attn": T5Attention(cfg, has_relative_bias=(i == 0),
                                    bidirectional=True, name=f"enc{i}_attn"),
                "ffn_ln": T5LayerNorm(cfg.layer_norm_epsilon, name=f"enc{i}_ffn_ln"),
                "ffn": T5FFN(cfg, name=f"enc{i}_ffn"),
            }
            for i in range(cfg.num_layers)
        ]
        self.enc_final_ln = T5LayerNorm(cfg.layer_norm_epsilon, name="enc_final_ln")
        self.dec_blocks = [
            {
                "self_ln": T5LayerNorm(cfg.layer_norm_epsilon, name=f"dec{i}_self_ln"),
                "self": T5Attention(cfg, has_relative_bias=(i == 0),
                                    bidirectional=False, name=f"dec{i}_self"),
                "cross_ln": T5LayerNorm(cfg.layer_norm_epsilon, name=f"dec{i}_cross_ln"),
                "cross": T5Attention(cfg, has_relative_bias=False,
                                     name=f"dec{i}_cross"),
                "ffn_ln": T5LayerNorm(cfg.layer_norm_epsilon, name=f"dec{i}_ffn_ln"),
                "ffn": T5FFN(cfg, name=f"dec{i}_ffn"),
            }
            for i in range(cfg.num_decoder_layers)
        ]
        self.dec_final_ln = T5LayerNorm(cfg.layer_norm_epsilon, name="dec_final_ln")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, name="lm_head")

    def encode(self, enc_ids, enc_mask):
        x = self.shared(enc_ids)
        attn_mask = enc_mask[:, None, None, :]  # [B,1,1,Tk]
        bias = None
        for blk in self.enc_blocks:
            ln_x = blk["attn_ln"](x)
            h, bias = blk["attn"](ln_x, ln_x, attn_mask, bias)
            x = x + h
            x = x + blk["ffn"](blk["ffn_ln"](x))
        return self.enc_final_ln(x)

    def decode(self, enc_out, enc_mask, dec_ids):
        B, Td = dec_ids.shape
        x = self.shared(dec_ids)
        causal = jnp.tril(jnp.ones((Td, Td), bool))[None, None]
        cross_mask = enc_mask[:, None, None, :]
        bias = None
        for blk in self.dec_blocks:
            ln_x = blk["self_ln"](x)
            h, bias = blk["self"](ln_x, ln_x, causal, bias)
            x = x + h
            h, _ = blk["cross"](blk["cross_ln"](x), enc_out, cross_mask)
            x = x + h
            x = x + blk["ffn"](blk["ffn_ln"](x))
        x = self.dec_final_ln(x)
        if self.cfg.tie_word_embeddings:
            x = x * (self.cfg.d_model ** -0.5)
            return x @ self.shared.embedding.T
        return self.lm_head(x)

    def __call__(self, enc_ids, enc_mask, dec_ids):
        return self.decode(self.encode(enc_ids, enc_mask), enc_mask, dec_ids)


def encode_bytes(text: str, max_len: int) -> tuple[np.ndarray, int]:
    """ByT5 ids: utf-8 byte + 3, then EOS; padded with PAD_ID."""
    raw = list(text.encode("utf-8"))[: max_len - 1]
    ids = [b + 3 for b in raw] + [EOS_ID]
    n = len(ids)
    return np.asarray(ids + [PAD_ID] * (max_len - n), np.int32), n


def decode_bytes(ids) -> str:
    out = bytearray()
    for i in ids:
        i = int(i)
        if i == EOS_ID:
            break
        if 3 <= i < 259:  # ids >= 259 are ByT5 sentinel tokens — skip
            out.append(i - 3)
    return out.decode("utf-8", errors="ignore")


def byt5_greedy_decode(model: ByT5G2P, params, enc_ids, enc_mask,
                       max_steps: int = 48):
    """Batched greedy decode (full-prefix recompute per step — words are
    short, so the O(T^2) recompute stays negligible while keeping one jit).
    -> [B, max_steps] token ids (EOS-terminated rows)."""

    @jax.jit
    def run(params, enc_ids, enc_mask):
        enc_out = model.apply(params, enc_ids, enc_mask, method=model.encode)
        B = enc_ids.shape[0]
        dec = jnp.zeros((B, max_steps + 1), jnp.int32)  # starts with pad=start
        done = jnp.zeros((B,), bool)

        def step(carry, t):
            dec, done = carry
            logits = model.apply(params, enc_out, enc_mask, dec[:, :-1],
                                 method=model.decode)
            nxt = jnp.argmax(logits, axis=-1)
            tok = jnp.take_along_axis(nxt, t[None, None].repeat(B, 0), axis=1)[:, 0]
            tok = jnp.where(done, PAD_ID, tok)
            dec = dec.at[:, t + 1].set(tok)
            done = done | (tok == EOS_ID)
            return (dec, done), None

        (dec, done), _ = jax.lax.scan(step, (dec, done), jnp.arange(max_steps))
        return dec[:, 1:]

    return run(params, enc_ids, enc_mask)
