"""BERT-base polyphone classifier for Mandarin G2P (g2pW parity).

The reference's optional polyphone disambiguator is a BERT-base CoreML
classifier (`KokoroAne/G2P/Mandarin/MandarinG2pwModel.swift:3-38`): given a
tokenized sentence and the position of one target Hanzi, it emits logits
over the global polyphone label set (~700 bopomofo classes); the runtime
masks logits to the pronunciations valid for that character
(`MandarinPolyphoneCatalog`). This is the upstream architecture (HF
`BertModel` + a target-gather classification head) in flax with exact
semantics so `convert/g2pw.py` can load the real checkpoints:

  - embeddings: word + absolute position + token_type, then LayerNorm
  - post-norm encoder layers (residual -> LayerNorm), gelu intermediate
  - attention with 1/sqrt(head_dim) score scaling, biased projections
  - head: hidden[target_position] -> Dense(num_labels)
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertG2pwConfig:
    vocab_size: int = 21128  # bert-base-chinese
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    num_labels: int = 700  # polyphone label set


G2PW_BASE = BertG2pwConfig()
G2PW_TEST = BertG2pwConfig(vocab_size=128, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, max_position_embeddings=64,
                           num_labels=16)


class BertSelfAttention(nn.Module):
    cfg: BertG2pwConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        H = cfg.num_attention_heads
        Dh = cfg.hidden_size // H
        B, T, _ = x.shape
        q = nn.Dense(cfg.hidden_size, name="query")(x).reshape(B, T, H, Dh)
        k = nn.Dense(cfg.hidden_size, name="key")(x).reshape(B, T, H, Dh)
        v = nn.Dense(cfg.hidden_size, name="value")(x).reshape(B, T, H, Dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(Dh)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores,
                               jnp.finfo(scores.dtype).min)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, name="out")(out)


class BertG2pw(nn.Module):
    """`__call__(input_ids, attention_mask, token_type_ids, target_position)`
    -> polyphone logits [B, num_labels]."""

    cfg: BertG2pwConfig = G2PW_BASE

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 target_position):
        cfg = self.cfg
        B, T = input_ids.shape
        x = (
            nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_emb")(input_ids)
            + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="pos_emb")(jnp.arange(T))[None]
            + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       name="type_emb")(token_type_ids)
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="emb_ln")(x)
        for i in range(cfg.num_hidden_layers):
            h = BertSelfAttention(cfg, name=f"layer{i}_attn")(x, attention_mask)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name=f"layer{i}_attn_ln")(x + h)
            h = nn.Dense(cfg.intermediate_size, name=f"layer{i}_ffn_in")(x)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.hidden_size, name=f"layer{i}_ffn_out")(h)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name=f"layer{i}_ffn_ln")(x + h)
        target = jnp.take_along_axis(
            x, target_position[:, None, None].astype(jnp.int32).repeat(
                cfg.hidden_size, axis=2), axis=1,
        )[:, 0]  # [B, hidden]
        return nn.Dense(cfg.num_labels, name="classifier")(target)
