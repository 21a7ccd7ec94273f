"""Paraformer-style non-autoregressive zh ASR (SANM encoder + CIF + parallel
decoder).

Explicit JAX equivalent of the reference's Paraformer CoreML graphs
(`Paraformer/ParaformerManager.swift:10`, `ParaformerCif.swift`): SANM encoder
-> CIF alpha predictor -> integrate-and-fire -> parallel SANM decoder
(FunASR DecoderLayerSANM: FSMN self-memory + fused-kv cross attention +
decoder FFN with hidden LayerNorm and bias-free w_2, then a final FFN-only
decoders3 layer). The reference fires host-side; here CIF is a closed-form
overlap matrix (jittable, O(T*U) einsum on the MXU) so the whole model is one
program. Convertible from FunASR checkpoints via convert/paraformer.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from fluidaudio_tpu.models.sensevoice import (
    _SanmBlock,
    _sinusoid_posenc,
    SenseVoiceConfig,
)


@dataclass(frozen=True)
class ParaformerConfig:
    vocab_size: int = 8404
    d_model: int = 512
    n_encoder_layers: int = 50
    n_decoder_layers: int = 16
    n_heads: int = 4
    ffn_dim: int = 2048
    fsmn_kernel: int = 11
    max_tokens: int = 128  # static CIF output grid
    cif_threshold: float = 1.0
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def sanm(self) -> SenseVoiceConfig:
        return SenseVoiceConfig(
            vocab_size=self.vocab_size, d_model=self.d_model,
            n_layers=self.n_encoder_layers, n_heads=self.n_heads,
            ffn_dim=self.ffn_dim, fsmn_kernel=self.fsmn_kernel, dtype=self.dtype,
        )


PARAFORMER_LARGE = ParaformerConfig()
PARAFORMER_TEST = ParaformerConfig(
    vocab_size=64, d_model=64, n_encoder_layers=2, n_decoder_layers=2,
    ffn_dim=128, max_tokens=32, dtype="float32",
)


def cif_integrate(
    h: jax.Array, alphas: jax.Array, max_tokens: int, threshold: float = 1.0
) -> tuple[jax.Array, jax.Array]:
    """Continuous integrate-and-fire as a closed-form overlap matrix.

    h [B, T, D], alphas [B, T] (>=0) -> (acoustic embeddings [B, U, D],
    token_counts [B]). Token u aggregates frames weighted by the overlap of
    the frame's alpha-interval [csum_{t-1}, csum_t) with [u*thr, (u+1)*thr).
    """
    B, T, D = h.shape
    csum = jnp.cumsum(alphas, axis=1)  # [B, T]
    lo = jnp.concatenate([jnp.zeros((B, 1), alphas.dtype), csum[:, :-1]], axis=1)
    u_edges = jnp.arange(max_tokens, dtype=alphas.dtype) * threshold  # [U]
    # overlap(frame t, token u) = clip(min(csum_t, e_u+thr) - max(lo_t, e_u), 0)
    upper = jnp.minimum(csum[:, :, None], (u_edges + threshold)[None, None, :])
    lower = jnp.maximum(lo[:, :, None], u_edges[None, None, :])
    w = jnp.maximum(upper - lower, 0.0) / threshold  # [B, T, U]
    emb = jnp.einsum("btu,btd->bud", w.astype(h.dtype), h)
    counts = jnp.minimum(jnp.floor(csum[:, -1] / threshold), max_tokens).astype(jnp.int32)
    return emb, counts


class CifPredictor(nn.Module):
    """Encoder states -> per-frame alphas (FunASR predictor: cif_conv1d ->
    relu -> cif_output linear -> sigmoid)."""

    cfg: ParaformerConfig

    @nn.compact
    def __call__(self, h, pad_mask):
        dt = self.cfg.compute_dtype
        x = nn.Conv(self.cfg.d_model, (3,), padding="SAME", dtype=dt, name="conv")(h)
        x = nn.relu(x)
        a = nn.Dense(1, dtype=dt, name="alpha_head")(x)[..., 0]
        a = jax.nn.sigmoid(a.astype(jnp.float32))
        return a * pad_mask.astype(jnp.float32)


class _DecoderFfn(nn.Module):
    """FunASR PositionwiseFeedForwardDecoderSANM: w_2(norm(relu(w_1(x)))),
    w_2 bias-free with a LayerNorm over the hidden dim."""

    cfg: ParaformerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        f = nn.Dense(cfg.ffn_dim, dtype=dt, name="ffn1")(x)
        f = nn.LayerNorm(dtype=dt, name="ffn_norm")(nn.relu(f))
        return nn.Dense(cfg.d_model, use_bias=False, dtype=dt, name="ffn2")(f)


class _DecoderBlock(nn.Module):
    """FunASR DecoderLayerSANM: the "self attention" is a pure FSMN memory
    conv (no attention weights); cross attention has a single fused
    linear_k_v over the encoder memory. Convertible via convert/paraformer.py."""

    cfg: ParaformerConfig

    @nn.compact
    def __call__(self, x, enc, tok_mask, cross_mask):
        cfg = self.cfg
        dt = cfg.compute_dtype
        D, H = cfg.d_model, cfg.n_heads
        hd = D // H
        B, U, _ = x.shape
        Tenc = enc.shape[1]

        # FunASR DecoderLayerSANM order: the FFN runs FIRST and has NO
        # residual of its own — the layer residual (the original input) joins
        # AFTER the FSMN memory block:
        #   t = ffn(norm1(x)); x = x + fsmn(norm2(t)); x = x + cross(norm3(x))
        residual = x
        t = nn.LayerNorm(dtype=dt, name="norm1")(x)
        t = _DecoderFfn(cfg, name="ffn")(t)

        # self "attention": FSMN memory conv over the masked normed FFN output
        h = nn.LayerNorm(dtype=dt, name="norm2")(t)
        hm = h * tok_mask[..., None].astype(dt)
        left = (cfg.fsmn_kernel - 1) // 2
        mem = nn.Conv(D, (cfg.fsmn_kernel,),
                      padding=((left, cfg.fsmn_kernel - 1 - left),),
                      feature_group_count=D, use_bias=False, dtype=dt,
                      name="fsmn")(hm)
        x = residual + mem * tok_mask[..., None].astype(dt)

        # cross attention: q from decoder, fused k/v from encoder memory
        h = nn.LayerNorm(dtype=dt, name="norm3")(x)
        q = nn.Dense(D, dtype=dt, name="q")(h).reshape(B, U, H, hd)
        kv = nn.Dense(2 * D, dtype=dt, name="kv")(enc)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(B, Tenc, H, hd)
        v = v.reshape(B, Tenc, H, hd)
        scores = jnp.einsum("buhd,bthd->bhut", q, k) / np.sqrt(hd)
        scores = jnp.where(cross_mask, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        att = jnp.einsum("bhut,bthd->buhd", probs, v).reshape(B, U, D)
        return x + nn.Dense(D, dtype=dt, name="out")(att)


class Paraformer(nn.Module):
    """(lfr [B, T, 560], lengths [B]) -> (logits [B, U, V], token_counts [B])."""

    cfg: ParaformerConfig = PARAFORMER_LARGE

    @nn.compact
    def __call__(self, lfr, lengths, target_lengths=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, T, F_in = lfr.shape
        # FunASR SANMEncoder: sqrt(d_model) scale + 1-indexed sinusoid posenc,
        # then encoders0 (in_size 560) + remaining blocks + after_norm
        x = lfr.astype(dt) * np.sqrt(cfg.d_model) \
            + _sinusoid_posenc(T, F_in).astype(dt)[None]
        pad_mask = jnp.arange(T)[None, :] < lengths[:, None]
        sanm = cfg.sanm()
        x = _SanmBlock(sanm, in_size=F_in, name="enc0")(x, pad_mask)
        for i in range(1, cfg.n_encoder_layers):
            x = _SanmBlock(sanm, in_size=sanm.d_model, name=f"enc{i}")(x, pad_mask)
        enc = nn.LayerNorm(dtype=dt, name="enc_ln")(x)

        alphas = CifPredictor(cfg, name="cif")(enc, pad_mask)
        alpha_sum = alphas.sum(axis=1)  # [B] differentiable fire count
        if target_lengths is not None:
            # training-time CIF length scaling (FunASR cif_predictor: alphas
            # rescaled so the fire count equals the label length, keeping
            # decoder positions aligned while the quantity loss pulls
            # alpha_sum toward target_lengths)
            scale = target_lengths.astype(alphas.dtype) / jnp.maximum(
                alpha_sum, 1e-6
            )
            alphas = alphas * scale[:, None]
            emb, counts = cif_integrate(enc, alphas, cfg.max_tokens,
                                        cfg.cif_threshold)
        else:
            # inference: FunASR tail_threshold=0.45 — a virtual tail frame
            # (zero hidden) flushes the integration residual, so a residual
            # > threshold - 0.45 still fires its token instead of being
            # floored away (funasr cif_predictor.py tail handling; without
            # this, a model whose alphas sum to ~n drops the last token
            # whenever the sum lands at n - eps)
            B_ = alphas.shape[0]
            tail = jnp.full((B_, 1), 0.45, alphas.dtype)
            alphas_t = jnp.concatenate([alphas, tail], axis=1)
            enc_t = jnp.concatenate([enc, jnp.zeros_like(enc[:, :1])], axis=1)
            emb, counts = cif_integrate(enc_t, alphas_t, cfg.max_tokens,
                                        cfg.cif_threshold)

        tok_mask = jnp.arange(cfg.max_tokens)[None, :] < counts[:, None]
        cross_mask = tok_mask[:, None, :, None] & pad_mask[:, None, None, :]
        y = emb.astype(dt)
        for i in range(cfg.n_decoder_layers):
            y = _DecoderBlock(cfg, name=f"dec{i}")(y, enc, tok_mask, cross_mask)
        # decoders3: final FFN-only DecoderLayerSANM — FunASR returns the FFN
        # output directly, with NO residual (x = ffn(norm1(tgt)))
        h = nn.LayerNorm(dtype=dt, name="dec3_norm1")(y)
        y = _DecoderFfn(cfg, name="dec3_ffn")(h)
        y = nn.LayerNorm(dtype=dt, name="dec_ln")(y)
        logits = nn.Dense(cfg.vocab_size, dtype=dt, name="head")(y)
        if target_lengths is not None:
            # training mode: expose the raw fire count for the quantity loss
            return logits.astype(jnp.float32), counts, alpha_sum
        return logits.astype(jnp.float32), counts
