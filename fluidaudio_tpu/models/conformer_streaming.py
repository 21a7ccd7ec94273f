"""Cache-aware streaming FastConformer encoder (EOU / Nemotron family).

Explicit JAX equivalent of the reference's streaming encoder graphs
(`Streaming/EOU/StreamingEouAsrManager.swift:17-150,380-560`): per-chunk step
with carried caches — mel pre-cache [B, n_mels, 16], per-layer attention
left-context cache (`cache_last_channel` [L, B, 70, D]) and causal-conv tail
cache (`cache_last_time` [L, B, k-1, D]). The reference crosses the host<->ANE
boundary 3x per chunk; here the WHOLE chunk step (subsample -> L blocks ->
cache updates) is one jitted function whose caches live in HBM as carried
arrays (SURVEY.md §5 "streaming caches under jit").

Architecture: causal depthwise convs (valid, left-padded by the cache) and
bounded left-context attention — the streaming counterpart of
`conformer.ConformerEncoder` (which is the offline, centered-conv variant).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class StreamingConformerConfig:
    n_mels: int = 128
    d_model: int = 512
    n_layers: int = 17
    n_heads: int = 8
    ffn_expansion: int = 4
    conv_kernel: int = 9
    att_context_left: int = 70  # cached frames per layer
    pre_cache_mel: int = 16  # mel frames of subsampling left context
    subsampling_channels: int = 256
    dtype: str = "float32"
    # NeMo ConformerEncoder `xscaling` (sqrt(d_model) on subsampled features);
    # same weights-day contract as conformer.ConformerConfig.xscale
    xscale: bool = True

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def conv_cache(self) -> int:
        return self.conv_kernel - 1


EOU_120M = StreamingConformerConfig()
NEMOTRON_EN = StreamingConformerConfig(d_model=1024, n_layers=24)


class StreamingCaches(NamedTuple):
    pre_cache: jax.Array  # [B, n_mels, pre_cache_mel]
    channel: jax.Array  # [L, B, att_context_left, D] attention K/V inputs
    time: jax.Array  # [L, B, conv_kernel-1, D] conv tails
    channel_len: jax.Array  # [B] valid frames currently in the channel cache


def init_caches(cfg: StreamingConformerConfig, batch: int) -> StreamingCaches:
    return StreamingCaches(
        pre_cache=jnp.zeros((batch, cfg.n_mels, cfg.pre_cache_mel), jnp.float32),
        channel=jnp.zeros(
            (cfg.n_layers, batch, cfg.att_context_left, cfg.d_model), cfg.compute_dtype
        ),
        time=jnp.zeros((cfg.n_layers, batch, cfg.conv_cache, cfg.d_model), cfg.compute_dtype),
        channel_len=jnp.zeros((batch,), jnp.int32),
    )


class _StreamRelPosMHSA(nn.Module):
    """Q over the chunk, K/V over [cache | chunk], causal + bounded left."""

    cfg: StreamingConformerConfig

    @nn.compact
    def __call__(self, x, cache, cache_len):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, T, D = x.shape
        C = cfg.att_context_left
        H, Dh = cfg.n_heads, cfg.head_dim

        xs = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln")(x)
        kv_in = jnp.concatenate([cache, xs], axis=1)  # [B, C+T, D]
        q = nn.Dense(D, dtype=dt, name="q")(xs).reshape(B, T, H, Dh)
        k = nn.Dense(D, dtype=dt, name="k")(kv_in).reshape(B, C + T, H, Dh)
        v = nn.Dense(D, dtype=dt, name="v")(kv_in).reshape(B, C + T, H, Dh)

        # relative offsets: key s vs query (C + t): s - C - t in [-(C+T-1), T-1]
        n_off = C + 2 * T - 1
        pos = _sinusoid_offsets(n_off, C + T - 1, D).astype(dt)  # offset o at idx o+(C+T-1)
        p = nn.Dense(D, use_bias=False, dtype=dt, name="pos")(pos).reshape(n_off, H, Dh)
        u = self.param("pos_bias_u", nn.initializers.zeros, (H, Dh), jnp.float32)
        w = self.param("pos_bias_v", nn.initializers.zeros, (H, Dh), jnp.float32)

        ac = jnp.einsum("bthd,bshd->bhts", q + u.astype(dt), k)  # [B,H,T,C+T]
        bd_all = jnp.einsum("bthd,rhd->bhtr", q + w.astype(dt), p)  # [B,H,T,n_off]
        t_idx = jnp.arange(T)[:, None]
        s_idx = jnp.arange(C + T)[None, :]
        off_idx = (s_idx - C - t_idx) + (C + T - 1)  # [T, C+T] into n_off
        bd = jnp.take_along_axis(
            bd_all, jnp.broadcast_to(off_idx[None, None], (B, H, T, C + T)), axis=-1
        )

        scores = (ac + bd) / np.sqrt(Dh)
        # causal within chunk; cache rows beyond cache_len are invalid
        causal = s_idx <= (C + t_idx)  # [T, C+T]
        cache_valid = s_idx >= (C - cache_len[:, None, None])  # [B, T, C+T] via broadcast
        mask = causal[None] & cache_valid
        scores = jnp.where(mask[:, None], scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        out = nn.Dense(D, dtype=dt, name="out")(out)
        # new cache: last C of pre-attention-normed inputs
        new_cache = kv_in[:, -C:]
        return out, new_cache


def _sinusoid_offsets(n: int, max_neg: int, d_model: int) -> jax.Array:
    # offsets from -(max_neg) .. n-1-max_neg, XL ordering handled by index math.
    # NeMo create_pe layout: sin at even / cos at odd feature indices
    # (interleaved) — the converted `linear_pos` kernel reads this order.
    off = jnp.arange(n, dtype=jnp.float32) - max_neg
    inv = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model)
    )
    ang = off[:, None] * inv[None, :]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return pe.reshape(n, d_model)


class _StreamConv(nn.Module):
    """Causal conformer conv module with carried left tail."""

    cfg: StreamingConformerConfig

    @nn.compact
    def __call__(self, x, tail):
        cfg = self.cfg
        dt = cfg.compute_dtype
        d = cfg.d_model
        xs = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln")(x)
        xs = nn.Dense(2 * d, dtype=dt, name="pointwise1")(xs)
        xs = nn.glu(xs, axis=-1)
        full = jnp.concatenate([tail, xs], axis=1)  # [B, k-1+T, D]
        y = nn.Conv(
            d, (cfg.conv_kernel,), feature_group_count=d, padding="VALID",
            use_bias=False,  # NeMo depthwise_conv has no bias
            dtype=dt, name="depthwise",
        )(full)
        scale = self.param("bn_scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (d,), jnp.float32)
        y = nn.silu(y * scale.astype(dt) + bias.astype(dt))
        y = nn.Dense(d, dtype=dt, name="pointwise2")(y)
        new_tail = full[:, -cfg.conv_cache :]
        return y, new_tail


class _StreamBlock(nn.Module):
    cfg: StreamingConformerConfig

    @nn.compact
    def __call__(self, x, ch_cache, time_cache, cache_len):
        cfg = self.cfg
        dt = cfg.compute_dtype
        d_ff = cfg.d_model * cfg.ffn_expansion

        def ffn(x, name):
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"{name}_ln")(x)
            h = nn.Dense(d_ff, dtype=dt, name=f"{name}_fc1")(h)
            h = nn.silu(h)
            return nn.Dense(cfg.d_model, dtype=dt, name=f"{name}_fc2")(h)

        x = x + 0.5 * ffn(x, "ffn1")
        att, new_ch = _StreamRelPosMHSA(cfg, name="mhsa")(x, ch_cache, cache_len)
        x = x + att
        conv, new_time = _StreamConv(cfg, name="conv")(x, time_cache)
        x = x + conv
        x = x + 0.5 * ffn(x, "ffn2")
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, name="final_ln")(x), new_ch, new_time


class StreamingConformerEncoder(nn.Module):
    """One chunk step.

    (mel_chunk [B, n_mels, T_mel], caches) -> (enc [B, T_out, D], caches').
    T_mel must be a multiple of 8 (encoder frames = T_mel / 8); the mel
    pre-cache supplies subsampling left context.
    """

    cfg: StreamingConformerConfig

    @nn.compact
    def __call__(self, mel_chunk: jax.Array, caches: StreamingCaches):
        cfg = self.cfg
        dt = cfg.compute_dtype
        B = mel_chunk.shape[0]
        pc = cfg.pre_cache_mel

        full_mel = jnp.concatenate([caches.pre_cache, mel_chunk], axis=2)
        new_pre = full_mel[:, :, -pc:]

        # subsampling: same dw-striding topology as the offline encoder but
        # CAUSAL in time (left-pad 2, no lookahead) so chunked == full-run
        x = jnp.transpose(full_mel, (0, 2, 1))[..., None].astype(dt)
        c = cfg.subsampling_channels
        x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((2, 0), (1, 1)), dtype=dt, name="stem")(x)
        x = nn.relu(x)
        for i in range(2):
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((2, 0), (1, 1)),
                        feature_group_count=c, dtype=dt, name=f"dw{i}")(x)
            x = nn.Conv(c, (1, 1), dtype=dt, name=f"pw{i}")(x)
            x = nn.relu(x)
        Bx, T8, F8, C8 = x.shape
        # CHANNEL-major flatten (NeMo ConvSubsampling weights-day contract,
        # see conformer.DwStridingSubsampling)
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(Bx, T8, C8 * F8)
        x = nn.Dense(cfg.d_model, dtype=dt, name="proj")(x)
        if cfg.xscale:
            x = x * float(np.sqrt(cfg.d_model))
        # drop the frames contributed by the pre-cache context
        ctx_frames = pc // 8
        x = x[:, ctx_frames:]

        new_ch, new_time = [], []
        for i in range(cfg.n_layers):
            x, ch_i, t_i = _StreamBlock(cfg, name=f"block{i}")(
                x, caches.channel[i], caches.time[i], caches.channel_len
            )
            new_ch.append(ch_i)
            new_time.append(t_i)

        T_out = x.shape[1]
        new_len = jnp.minimum(caches.channel_len + T_out, cfg.att_context_left)
        new_caches = StreamingCaches(
            pre_cache=new_pre,
            channel=jnp.stack(new_ch),
            time=jnp.stack(new_time),
            channel_len=new_len,
        )
        return x.astype(jnp.float32), new_caches
