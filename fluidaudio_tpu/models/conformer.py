"""FastConformer encoder (NeMo-style), TPU-first in flax.linen.

This is the explicit JAX equivalent of the opaque CoreML encoder graphs the
reference orchestrates (`TDT/AsrModels.swift:5-54`; encoder call at
`TDT/AsrManager+Pipeline.swift:45`). Architecture follows NeMo FastConformer:
  - 8x depthwise-separable striding subsampling (3 conv stages, stride 2 each)
  - N conformer blocks: 0.5*FFN -> rel-pos MHSA -> conv module -> 0.5*FFN -> LN
  - Transformer-XL relative positional multi-head attention
  - conv module: LN -> pointwise(2d, GLU) -> depthwise(k) -> BN -> SiLU -> pointwise

TPU design notes:
  - all shapes static; padding handled by boolean masks derived from lengths
  - compute dtype bf16 (params f32) so matmuls hit the MXU at full rate
  - attention is full (15 s windows are <=188 frames after 8x subsampling, so
    T^2 is tiny); streaming variants use bounded left-context masks + caches
  - long audio is windowed by the ChunkProcessor and stacked on the batch axis,
    which is itself sharded over the mesh data axis (parallel/mesh.py)

Model presets mirror `TDT/AsrModels.swift` version table (hidden size 1024,
v2/v3) and `Streaming/EOU/StreamingEouAsrManager.swift:17-150` (512-d, 17
layers, cache-aware).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ConformerConfig:
    n_mels: int = 128
    d_model: int = 1024
    n_layers: int = 24
    n_heads: int = 8
    ffn_expansion: int = 4
    conv_kernel: int = 9
    subsampling_factor: int = 8
    subsampling_channels: int = 256
    dropout: float = 0.0  # inference default
    # streaming (cache-aware) attention: -1 = full context
    att_context_left: int = -1
    att_context_right: int = -1
    dtype: str = "bfloat16"  # compute dtype
    # "auto": fused Pallas rel-pos attention on TPU for full-context models
    # (ops/attention_pallas.py — one VMEM-resident kernel per (batch, head)
    # instead of ~7 HBM passes); "xla": always the einsum path.
    attention_backend: str = "auto"
    # "none" | "int8": dynamic w8a8 on the large matmuls (FFN, attention
    # projections, conv pointwise) via ops/quant.Int8Dense — ~1.6x the bf16
    # MXU rate on v5e; param tree is unchanged so converters/checkpoints
    # work for both modes. The reference ships the same trade (int8
    # Nemotron encoder, SURVEY §2.4).
    quantization: str = "none"
    # NeMo ConformerEncoder `xscaling` (default true in the FastConformer
    # configs): multiply subsampled features by sqrt(d_model) before the
    # blocks. Converters read the real value from the .nemo yaml
    # (convert/parakeet.config_from_nemo_yaml).
    xscale: bool = True

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    def out_length(self, mel_frames: int) -> int:
        """Encoder frame count after 8x subsampling (3 stride-2 convs, k=3, p=1)."""
        t = mel_frames
        for _ in range(3):
            t = (t + 2 - 3) // 2 + 1
        return t


# Presets (sizes from SURVEY.md §2.4 / NeMo checkpoints the CoreML bundles wrap)
PARAKEET_V3 = ConformerConfig()  # 0.6B: 24 x 1024, 8 heads
PARAKEET_V2 = ConformerConfig()
PARAKEET_110M = ConformerConfig(d_model=512, n_layers=17)
EOU_120M = ConformerConfig(
    d_model=512, n_layers=17, att_context_left=70, att_context_right=0
)


def _dense(cfg: "ConformerConfig", features: int, name: str,
           use_bias: bool = True):
    """nn.Dense or its int8 drop-in, per cfg.quantization (same params)."""
    if cfg.quantization == "int8":
        from fluidaudio_tpu.ops.quant import Int8Dense

        return Int8Dense(features, use_bias=use_bias, dtype=cfg.compute_dtype,
                         name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.compute_dtype,
                    name=name)


class GLUConv(nn.Module):
    """Conformer convolution module (inference BN folded as scale/bias)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        d = cfg.d_model
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.compute_dtype, name="ln")(x)
        x = _dense(cfg, 2 * d, "pointwise1")(x)
        x = nn.glu(x, axis=-1)
        # zero padded frames so the depthwise conv does not smear pad energy
        x = x * pad_mask[..., None].astype(x.dtype)
        x = nn.Conv(
            features=d,
            kernel_size=(cfg.conv_kernel,),
            feature_group_count=d,
            padding="SAME",
            use_bias=False,  # NeMo depthwise_conv has no bias
            dtype=cfg.compute_dtype,
            name="depthwise",
        )(x)
        # BatchNorm in inference mode == learned scale/bias over channels
        scale = self.param("bn_scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (d,), jnp.float32)
        x = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        x = nn.silu(x)
        x = _dense(cfg, d, "pointwise2")(x)
        return x


class RelPosMHSA(nn.Module):
    """Transformer-XL style relative positional multi-head self-attention.

    Two compute paths with identical semantics:
      - XLA einsum path (always correct, any mask shape)
      - fused Pallas kernel (`ops/attention_pallas.relpos_attention`) for
        full-context models on TPU — selected via cfg.attention_backend,
        requires the caller to pass `lengths` (per-row valid key counts).
    """

    cfg: ConformerConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        att_mask: jax.Array,
        lengths: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        B, T, _ = x.shape
        H, Dh = cfg.n_heads, cfg.head_dim
        dt = cfg.compute_dtype

        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln")(x)
        q = _dense(cfg, cfg.d_model, "q")(x).reshape(B, T, H, Dh)
        k = _dense(cfg, cfg.d_model, "k")(x).reshape(B, T, H, Dh)
        v = _dense(cfg, cfg.d_model, "v")(x).reshape(B, T, H, Dh)

        # relative position embeddings for offsets [-(T-1), T-1]
        pos = _rel_sinusoid(T, cfg.d_model).astype(dt)  # [2T-1, D]
        p = _dense(cfg, cfg.d_model, "pos", use_bias=False)(pos)

        u = self.param("pos_bias_u", nn.initializers.zeros, (H, Dh), jnp.float32)
        w = self.param("pos_bias_v", nn.initializers.zeros, (H, Dh), jnp.float32)

        use_pallas = (
            cfg.attention_backend != "xla"
            and lengths is not None
            and cfg.att_context_left < 0
            and cfg.att_context_right < 0
            and Dh == 128
            and jax.default_backend() not in ("cpu",)
        )
        if use_pallas:
            from fluidaudio_tpu.ops.attention_pallas import relpos_attention

            # [B,H,T,Dh] layout: the HBM transposes measure FASTER than
            # feeding the kernel the natural [B,T,H,Dh] layout (strided
            # per-head VMEM reads cost more than the transpose passes save)
            qu = (q + u.astype(dt)).transpose(0, 2, 1, 3)
            qw = (q + w.astype(dt)).transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            ph = p.reshape(2 * T - 1, H, Dh).transpose(1, 0, 2)  # [H,2T-1,Dh]
            out = relpos_attention(qu, qw, kt, vt, ph, lengths, T)
            out = out.astype(dt).transpose(0, 2, 1, 3).reshape(B, T, cfg.d_model)
        else:
            p = p.reshape(2 * T - 1, H, Dh)
            # content score: (q + u) . k
            ac = jnp.einsum("bthd,bshd->bhts", q + u.astype(dt), k)
            # position score: (q + w) . p, then shift to align relative offsets
            bd = jnp.einsum("bthd,rhd->bhtr", q + w.astype(dt), p)  # [B,H,T,2T-1]
            bd = _rel_shift(bd)  # [B,H,T,T]

            scores = (ac + bd) / np.sqrt(Dh)
            scores = jnp.where(att_mask[:, None, :, :], scores, jnp.finfo(dt).min)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
            out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, cfg.d_model)
        return _dense(cfg, cfg.d_model, "out")(out)


def _rel_sinusoid(T: int, d_model: int) -> jax.Array:
    """Sinusoidal embeddings for relative offsets T-1 .. -(T-1).

    NeMo `RelPositionalEncoding.create_pe` layout: sin at EVEN feature
    indices, cos at ODD (interleaved) — `linear_pos` weights converted from
    NeMo checkpoints read this exact column order, so the layout is a
    weights-day contract, not a style choice."""
    pos = jnp.arange(T - 1, -T, -1, dtype=jnp.float32)  # [2T-1]
    inv = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model)
    )
    ang = pos[:, None] * inv[None, :]
    # interleave: [..., sin0, cos0, sin1, cos1, ...]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return pe.reshape(2 * T - 1, d_model)


def _rel_shift(bd: jax.Array) -> jax.Array:
    """[B,H,T,2T-1] -> [B,H,T,T]: bd'[t, s] = bd[t, (T-1) + (s - t)].

    NeMo `RelPositionMultiHeadAttention.rel_shift` semantics: pad one column
    on the left, view as [2T, T], drop the first ROW, view back as
    [T, 2T-1], then keep the first T key columns. (The superficially similar
    pad->reshape->row-slice variant picks scores from the WRONG QUERY ROWS —
    pinned by tests/test_conformer_nemo_parity.py.)"""
    B, H, T, R = bd.shape
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,R+1]
    bd = bd.reshape(B, H, R + 1, T)[:, :, 1:]  # drop first row
    return bd.reshape(B, H, T, R)[:, :, :, :T]


class ConformerBlock(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        pad_mask: jax.Array,
        att_mask: jax.Array,
        lengths: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        d_ff = cfg.d_model * cfg.ffn_expansion

        def ffn(x, name):
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"{name}_ln")(x)
            h = _dense(cfg, d_ff, f"{name}_fc1")(h)
            h = nn.silu(h)
            return _dense(cfg, cfg.d_model, f"{name}_fc2")(h)

        x = x + 0.5 * ffn(x, "ffn1")
        x = x + RelPosMHSA(cfg, name="mhsa")(x, att_mask, lengths)
        x = x + GLUConv(cfg, name="conv")(x, pad_mask)
        x = x + 0.5 * ffn(x, "ffn2")
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, name="final_ln")(x)


class DwStridingSubsampling(nn.Module):
    """8x time reduction: conv stem + 2 depthwise-separable stride-2 stages."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel [B, n_mels, T] -> [B, T//8, d_model]."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        c = cfg.subsampling_channels
        x = jnp.transpose(mel, (0, 2, 1))[..., None].astype(dt)  # [B, T, F, 1]
        x = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=dt, name="stem")(x)
        x = nn.relu(x)
        for i in range(2):
            x = nn.Conv(
                c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                feature_group_count=c, dtype=dt, name=f"dw{i}",
            )(x)
            x = nn.Conv(c, (1, 1), dtype=dt, name=f"pw{i}")(x)
            x = nn.relu(x)
        B, T8, F8, C = x.shape
        # flatten CHANNEL-major (C, F) to match NeMo ConvSubsampling's
        # `x.transpose(1, 2).reshape(b, t, -1)` on NCHW — the converted
        # `pre_encode.out` kernel rows are in this order (weights-day contract)
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T8, C * F8)
        return _dense(cfg, cfg.d_model, "proj")(x)


class ConformerEncoder(nn.Module):
    """Batch encoder: (mel [B, n_mels, T], mel_lengths [B]) -> [B, T', D], lengths'."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(
        self, mel: jax.Array, mel_lengths: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        x = DwStridingSubsampling(cfg, name="subsampling")(mel)
        if cfg.xscale:
            # NeMo RelPositionalEncoding.forward: x *= sqrt(d_model)
            # (python float: weak-typed, keeps the compute dtype)
            x = x * float(np.sqrt(cfg.d_model))
        B, T, _ = x.shape

        out_lengths = mel_lengths
        for _ in range(3):
            out_lengths = (out_lengths + 2 - 3) // 2 + 1
        out_lengths = jnp.clip(out_lengths, 0, T).astype(jnp.int32)

        frame_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        pad_mask = frame_idx < out_lengths[:, None]  # [B, T]

        att = pad_mask[:, None, :] & pad_mask[:, :, None]  # [B, T, T]
        if cfg.att_context_left >= 0 or cfg.att_context_right >= 0:
            rel = frame_idx[0][None, :] - frame_idx[0][:, None]  # s - t
            ctx = jnp.ones((T, T), dtype=bool)
            if cfg.att_context_left >= 0:
                ctx &= rel >= -cfg.att_context_left
            if cfg.att_context_right >= 0:
                ctx &= rel <= cfg.att_context_right
            att &= ctx[None, :, :]

        for i in range(cfg.n_layers):
            x = ConformerBlock(cfg, name=f"block{i}")(x, pad_mask, att, out_lengths)

        x = x * pad_mask[..., None].astype(x.dtype)
        return x.astype(jnp.float32), out_lengths
