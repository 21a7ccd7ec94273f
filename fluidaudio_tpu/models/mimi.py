"""Mimi neural audio codec (decoder + encoder), real architecture, streaming.

The reference's `mimi_decoder` CoreML graph turns one 32-d latent frame into
1920 samples @ 24 kHz while threading 23 streaming state tensors
(`/root/reference/Sources/FluidAudio/TTS/PocketTTS/Pipeline/PocketTtsSynthesizer+Mimi.swift`,
`PocketTtsConstants.swift:14-17`). That graph is Kyutai's Mimi codec decoder
(the Moshi codec): a frame-rate transformer + a causal SEANet upsampling
stack. This module implements the real architecture with the streaming state
explicit, sized so the state inventory matches the reference's 23 tensors:

  latent [B, 32]
   -> input proj (32 -> 512)
   -> decoder transformer at 12.5 Hz: 8 layers, d=512, 8 heads, GELU MLP
      2048, RoPE, LayerScale, ring KV cache of 250 frames
                                                        [8 combined-KV states]
   -> x2 time upsample: depthwise causal ConvTranspose (12.5 Hz -> 25 Hz)
   -> SEANet decoder: Conv k7 -> 4 x (ELU, ConvTranspose k=2r stride r
      (r in 8,6,5,4), ResnetBlock[k3 dil1 + k1]) -> ELU, Conv k3 -> tanh-free
      PCM                                                [15 conv states]
   == 23 streaming states; 960 x 2 = 1920 samples per frame.

All convolutions are causal; streaming state per conv is its left context
(zero-length for k=1, mirroring the reference's zero-size state tensors).
The encoder (voice cloning: 1-30 s sample -> prompt latents,
`PocketTtsVoiceCloner.swift`) is the mirrored SEANet encoder + transformer,
run batched (not streaming).

Weight layout matches `convert/mimi.py` (Moshi-style checkpoint names).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 24_000
FRAME_SAMPLES = 1920  # 80 ms @ 24 kHz (12.5 Hz frame rate)


@dataclass(frozen=True)
class MimiConfig:
    latent_dim: int = 32
    dim: int = 512
    n_filters: int = 64
    ratios: tuple[int, ...] = (8, 6, 5, 4)  # decoder order (upsampling)
    kernel: int = 7
    last_kernel: int = 3
    resid_kernel: int = 3
    compress: int = 2
    trans_layers: int = 8
    trans_heads: int = 8
    trans_ff: int = 2048
    trans_context: int = 250
    layer_scale: float = 0.01

    @property
    def head_dim(self) -> int:
        return self.dim // self.trans_heads

    @property
    def hop(self) -> int:
        return 2 * int(np.prod(self.ratios))


MIMI_TEST = MimiConfig(
    latent_dim=8, dim=32, n_filters=4, ratios=(4, 3), kernel=5,
    trans_layers=2, trans_heads=4, trans_ff=64, trans_context=16,
)


# ---------------------------------------------------------------------------
# causal conv primitives with explicit streaming state
# ---------------------------------------------------------------------------


def causal_conv_step(x, state, kernel, bias, stride=1, dilation=1, groups=1):
    """One streaming step of a causal Conv1d.

    x [B, T, Cin] (T a multiple of stride), state [B, S, Cin] with
    S = (k-1)*dilation + 1 - stride of left context. Returns
    (y [B, T//stride, Cout], new_state).
    """
    k = kernel.shape[0]
    buf = jnp.concatenate([state, x], axis=1)
    y = jax.lax.conv_general_dilated(
        buf, kernel, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias
    keff = (k - 1) * dilation + 1
    new_state = buf[:, buf.shape[1] - (keff - stride):] if keff > stride else buf[:, :0]
    return y, new_state


def causal_convtr_step(x, state, kernel, bias, stride, groups=1):
    """One streaming step of a causal ConvTranspose1d.

    x [B, T, Cin], state [B, k-stride, Cout] carried overlap. Emits
    y [B, T*stride, Cout]; tail overlap (k - stride) is carried forward.
    """
    k = kernel.shape[0]
    w = jnp.flip(kernel, axis=0)
    full = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
    )  # length (T-1)*stride + k
    T_out = x.shape[1] * stride
    carry = k - stride
    if carry > 0:
        full = full.at[:, : state.shape[1]].add(state)
    y = full[:, :T_out]
    if bias is not None:
        y = y + bias
    new_state = full[:, T_out : T_out + max(carry, 0)]
    return y, new_state


def conv_state_size(k, stride=1, dilation=1):
    return max((k - 1) * dilation + 1 - stride, 0)


class StreamConv(nn.Module):
    """Causal streaming Conv1d as a flax module (params only; state explicit)."""

    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, state):
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, in_ch // self.groups, self.out_ch),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return causal_conv_step(x, state, w, b, self.stride, self.dilation, self.groups)

    def state_shape(self, batch, in_ch):
        return (batch, conv_state_size(self.kernel, self.stride, self.dilation), in_ch)


class StreamConvTr(nn.Module):
    """Causal streaming ConvTranspose1d (params only; state explicit)."""

    out_ch: int
    kernel: int
    stride: int
    groups: int = 1

    @nn.compact
    def __call__(self, x, state):
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, in_ch // self.groups, self.out_ch),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return causal_convtr_step(x, state, w, b, self.stride, self.groups)

    def state_shape(self, batch):
        return (batch, max(self.kernel - self.stride, 0), self.out_ch)


# ---------------------------------------------------------------------------
# frame-rate transformer with ring KV cache
# ---------------------------------------------------------------------------


def _rope(q, pos):
    """Rotary embedding on [B, T, H, D] at absolute positions pos [B, T]."""
    D = q.shape[-1]
    half = D // 2
    freqs = 1.0 / (10000 ** (jnp.arange(half) / half))
    ang = pos[..., None, None] * freqs[None, None, None, :]  # [B,T,1,half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    q1, q2 = q[..., :half], q[..., half:]
    return jnp.concatenate([q1 * cos - q2 * sin, q1 * sin + q2 * cos], axis=-1)


class MimiTransformerLayer(nn.Module):
    cfg: MimiConfig

    @nn.compact
    def __call__(self, x, pos, kv, kv_pos):
        """x [B, 1, D] one frame; kv [2, B, CTX, H, Dh] ring cache at write
        index kv_pos (absolute frame count). Returns (y, new_kv)."""
        cfg = self.cfg
        B = x.shape[0]
        H, Dh = cfg.trans_heads, cfg.head_dim
        ctx = cfg.trans_context

        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * cfg.dim, use_bias=False, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rope(q.reshape(B, 1, H, Dh), pos[:, None])
        k = _rope(k.reshape(B, 1, H, Dh), pos[:, None])
        v = v.reshape(B, 1, H, Dh)

        slot = jnp.mod(pos, ctx)
        new_k = jax.vmap(lambda c, s, val: c.at[s].set(val[0]))(kv[0], slot, k)
        new_v = jax.vmap(lambda c, s, val: c.at[s].set(val[0]))(kv[1], slot, v)
        # valid = positions in (pos-ctx, pos]
        idx = jnp.arange(ctx)[None, :]
        age = jnp.mod(slot[:, None] - idx, ctx)
        valid = (idx == slot[:, None]) | (age < jnp.minimum(pos[:, None] + 1, ctx))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, new_k.reshape(B, ctx, H, Dh))
        scores = scores / jnp.sqrt(jnp.asarray(Dh, x.dtype))
        scores = jnp.where(valid[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, new_v.reshape(B, ctx, H, Dh))
        att = nn.Dense(cfg.dim, use_bias=False, name="out_proj")(
            att.reshape(B, 1, cfg.dim)
        )
        ls1 = self.param("layer_scale_1", nn.initializers.constant(cfg.layer_scale),
                         (cfg.dim,))
        x = x + ls1 * att

        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(cfg.trans_ff, use_bias=False, name="mlp_in")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(cfg.dim, use_bias=False, name="mlp_out")(h)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(cfg.layer_scale),
                         (cfg.dim,))
        x = x + ls2 * h
        return x, jnp.stack([new_k, new_v])


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class MimiDecoder(nn.Module):
    """One-frame streaming decode: (latent [B, latent_dim], state) ->
    (samples [B, hop*2... == 1920], new_state).

    State pytree keys:
      kv      : [L, 2, B, CTX, H, Dh] transformer ring caches (L combined-KV
                tensors — the reference threads one KV tensor per layer)
      pos     : [B] absolute frame index
      convs   : list of conv left-context / convtr overlap buffers (15)
    """

    cfg: MimiConfig = MimiConfig()

    def setup(self):
        cfg = self.cfg
        self.input_proj = nn.Dense(cfg.dim, use_bias=False, name="input_proj")
        self.upsample = StreamConvTr(cfg.dim, 4, 2, groups=cfg.dim, name="upsample")
        self.layers = [
            MimiTransformerLayer(cfg, name=f"tr_{i}") for i in range(cfg.trans_layers)
        ]
        mult = 2 ** len(cfg.ratios)
        blocks = [StreamConv(cfg.n_filters * mult, cfg.kernel, name="conv_in")]
        ch = cfg.n_filters * mult
        for i, r in enumerate(cfg.ratios):
            blocks.append(StreamConvTr(ch // 2, 2 * r, r, name=f"up_{i}"))
            blocks.append(
                StreamConv(ch // 2 // cfg.compress, cfg.resid_kernel,
                           name=f"res_{i}_a")
            )
            blocks.append(StreamConv(ch // 2, 1, name=f"res_{i}_b"))
            ch //= 2
        blocks.append(StreamConv(1, cfg.last_kernel, name="conv_out"))
        self.blocks = blocks

    def init_state(self, batch: int) -> dict[str, Any]:
        cfg = self.cfg
        kv = jnp.zeros(
            (cfg.trans_layers, 2, batch, cfg.trans_context, cfg.trans_heads,
             cfg.head_dim), jnp.float32,
        )
        convs = []
        mult = 2 ** len(cfg.ratios)
        # mirror setup() order: conv_in, then per stage convtr + res convs
        convs.append(jnp.zeros((batch, conv_state_size(cfg.kernel), cfg.dim)))
        ch = cfg.n_filters * mult
        for r in cfg.ratios:
            convs.append(jnp.zeros((batch, max(2 * r - r, 0), ch // 2)))  # convtr carry
            convs.append(jnp.zeros((batch, conv_state_size(cfg.resid_kernel), ch // 2)))
            convs.append(jnp.zeros((batch, 0, ch // 2 // cfg.compress)))  # k=1
            ch //= 2
        convs.append(jnp.zeros((batch, conv_state_size(cfg.last_kernel), ch)))
        return {
            "kv": kv,
            "pos": jnp.zeros((batch,), jnp.int32),
            "upsample": jnp.zeros((batch, max(4 - 2, 0), cfg.dim)),
            "convs": convs,
        }

    def __call__(self, latent, state):
        # f32-accurate matmuls: the codec carries a 1e-5 torch-parity
        # contract that default TPU bf16 accumulation breaks (~1e-2 after
        # the layer stack); codec FLOPs are negligible vs the ASR encoder
        with jax.default_matmul_precision("highest"):
            return self._decode(latent, state)

    def _decode(self, latent, state):
        cfg = self.cfg
        x = self.input_proj(latent)[:, None, :]  # [B, 1, D]

        # transformer at 12.5 Hz (one step)
        new_kv = []
        pos = state["pos"]
        for i, layer in enumerate(self.layers):
            x, kv_i = layer(x, pos, state["kv"][i], pos)
            new_kv.append(kv_i)

        # upsample to 25 Hz
        x, up_state = self.upsample(x, state["upsample"])

        # SEANet stack
        conv_states = list(state["convs"])
        new_conv_states = []
        si = 0

        def run(block, x, residual=False):
            nonlocal si
            y, ns = block(x, conv_states[si])
            new_conv_states.append(ns)
            si += 1
            return y

        x = run(self.blocks[0], x)
        bi = 1
        for _ in cfg.ratios:
            x = nn.elu(x)
            x = run(self.blocks[bi], x)  # convtr
            res = nn.elu(x)
            res = run(self.blocks[bi + 1], res)
            res = nn.elu(res)
            res = run(self.blocks[bi + 2], res)
            x = x + res
            bi += 3
        x = nn.elu(x)
        x = run(self.blocks[bi], x)

        new_state = {
            "kv": jnp.stack(new_kv) if new_kv else state["kv"],
            "pos": pos + 1,
            "upsample": up_state,
            "convs": new_conv_states,
        }
        return x[..., 0], new_state


# ---------------------------------------------------------------------------
# encoder (voice cloning), batched
# ---------------------------------------------------------------------------


class MimiEncoder(nn.Module):
    """audio [B, N] -> latents [B, N // hop, latent_dim].

    Mirrored SEANet encoder (causal convs, downsampling order reversed) +
    x2 downsample + frame-rate transformer + output proj to latent_dim.
    Batched full-sequence (voice cloning path, not streaming).
    """

    cfg: MimiConfig = MimiConfig()

    def __call__(self, audio):
        # see MimiDecoder: f32-accurate matmuls for torch parity on TPU
        with jax.default_matmul_precision("highest"):
            return self._encode(audio)

    @nn.compact
    def _encode(self, audio):
        cfg = self.cfg

        def cconv(x, ch, k, stride=1, dilation=1, name=None):
            pad = (k - 1) * dilation + 1 - stride
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            return nn.Conv(ch, (k,), strides=(stride,), kernel_dilation=(dilation,),
                           padding="VALID", name=name)(x)

        x = audio[..., None]
        ch = cfg.n_filters
        x = cconv(x, ch, cfg.kernel, name="conv_in")
        for i, r in enumerate(reversed(cfg.ratios)):
            res = nn.elu(x)
            res = cconv(res, ch // cfg.compress, cfg.resid_kernel, name=f"res_{i}_a")
            res = nn.elu(res)
            res = cconv(res, ch, 1, name=f"res_{i}_b")
            x = x + res
            x = nn.elu(x)
            x = cconv(x, ch * 2, 2 * r, stride=r, name=f"down_{i}")
            ch *= 2
        x = nn.elu(x)
        x = cconv(x, cfg.dim, cfg.last_kernel, name="conv_out")
        # x2 downsample to 12.5 Hz (depthwise strided conv)
        pad = max(4 - 2, 0)
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        x = nn.Conv(cfg.dim, (4,), strides=(2,), padding="VALID",
                    feature_group_count=cfg.dim, name="downsample")(x)

        # batched causal transformer (full sequence)
        B, T, _ = x.shape
        H, Dh = cfg.trans_heads, cfg.head_dim
        causal = jnp.tril(jnp.ones((T, T), bool))
        window = (jnp.arange(T)[:, None] - jnp.arange(T)[None, :]) < cfg.trans_context
        mask = causal & window
        for i in range(cfg.trans_layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"tr_{i}_norm1")(x)
            qkv = nn.Dense(3 * cfg.dim, use_bias=False, name=f"tr_{i}_in_proj")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            poss = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
            q = _rope(q.reshape(B, T, H, Dh), poss)
            k = _rope(k.reshape(B, T, H, Dh), poss)
            v = v.reshape(B, T, H, Dh)
            sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(Dh, x.dtype))
            sc = jnp.where(mask[None, None], sc, -1e9)
            att = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(sc, -1), v)
            att = nn.Dense(cfg.dim, use_bias=False, name=f"tr_{i}_out_proj")(
                att.reshape(B, T, cfg.dim))
            ls1 = self.param(f"tr_{i}_ls1", nn.initializers.constant(cfg.layer_scale),
                             (cfg.dim,))
            x = x + ls1 * att
            h = nn.LayerNorm(epsilon=1e-5, name=f"tr_{i}_norm2")(x)
            h = nn.Dense(cfg.trans_ff, use_bias=False, name=f"tr_{i}_mlp_in")(h)
            h = nn.gelu(h, approximate=True)
            h = nn.Dense(cfg.dim, use_bias=False, name=f"tr_{i}_mlp_out")(h)
            ls2 = self.param(f"tr_{i}_ls2", nn.initializers.constant(cfg.layer_scale),
                             (cfg.dim,))
            x = x + ls2 * h
        return nn.Dense(cfg.latent_dim, use_bias=False, name="output_proj")(x)
