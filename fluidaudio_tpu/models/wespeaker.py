"""Speaker embedding network (WeSpeaker ResNet34 + masked stats pooling).

Explicit JAX equivalent of the reference's embedding CoreML graph:
waveform [S, 160000] + frame mask [S, 589] -> embeddings [S, 256]
(`Diarizer/Extraction/EmbeddingExtractor.swift:27-115`). Internally: 80-mel
fbank -> 2D ResNet34 trunk -> mask-weighted statistics pooling (TSTP) ->
256-d linear — the wespeaker-voxceleb-resnet34-LM architecture the
reference's CoreML bundle was converted from.

Checkpoint convertibility: convs are bias-free and every BatchNorm is an
inference-time folded affine (`bn_scale`/`bn_bias`, scale = gamma/sqrt(var+eps),
bias = beta - mean*scale) so `convert/wespeaker.py` maps torch state dicts
1:1 onto this tree.

TPU notes: fbank reuses the shared MelFrontend (Slaney, 25 ms/10 ms); the
frame mask (589 segmentation frames) is resampled to mel frames; everything is
batched over the speaker axis and jit-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend

EMBEDDING_DIM = 256


@dataclass(frozen=True)
class WeSpeakerConfig:
    n_mels: int = 80
    channels: tuple[int, ...] = (32, 64, 128, 256)
    # ResNet34 stage depths (wespeaker/models/resnet.py BasicBlock layout)
    blocks_per_stage: tuple[int, ...] = (3, 4, 6, 3)
    embedding_dim: int = EMBEDDING_DIM
    dtype: str = "float32"

    @staticmethod
    def tiny() -> "WeSpeakerConfig":
        """Small trunk for tests (same tree shape, 1 block per stage)."""
        return WeSpeakerConfig(blocks_per_stage=(1, 1, 1, 1))


class _BnAffine(nn.Module):
    """Inference-time BatchNorm: y = x * scale + bias over channels."""

    ch: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("bn_scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class _ResBlock(nn.Module):
    ch: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        # explicit pad=1 (not "SAME"): under stride 2 torch's symmetric pad
        # anchors windows at -1 while SAME anchors at 0 — alignment parity
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                    name="conv1")(x)
        h = nn.relu(_BnAffine(self.ch, name="bn1")(h))
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, name="conv2")(h)
        h = _BnAffine(self.ch, name="bn2")(h)
        if x.shape[-1] != self.ch or self.stride != 1:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                        padding="VALID", use_bias=False, dtype=dt, name="short")(x)
            x = _BnAffine(self.ch, name="short_bn")(x)
        return nn.relu(x + h)


class WeSpeakerEmbedder(nn.Module):
    """(mel [S, T, n_mels], frame_weights [S, T]) -> embeddings [S, 256]."""

    cfg: WeSpeakerConfig = WeSpeakerConfig()

    @nn.compact
    def __call__(self, mel: jax.Array, frame_weights: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = mel[..., None].astype(dt)  # [S, T, F, 1]
        x = nn.Conv(cfg.channels[0], (3, 3), padding="SAME", use_bias=False,
                    dtype=dt, name="stem")(x)
        x = nn.relu(_BnAffine(cfg.channels[0], name="stem_bn")(x))
        for si, (ch, depth) in enumerate(zip(cfg.channels, cfg.blocks_per_stage)):
            for bi in range(depth):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = _ResBlock(ch, stride, dt, name=f"s{si}b{bi}")(x)
        S, T, F, C = x.shape
        feat = x.reshape(S, T, F * C)

        # mask-weighted statistics pooling over time (TSTP)
        w = frame_weights
        if w.shape[1] != T:
            # nearest-neighbor resample of the mask to the trunk's frame rate
            idx = (jnp.arange(T) * w.shape[1] // T).astype(jnp.int32)
            w = w[:, idx]
        w = w.astype(dt)[..., None]
        denom = jnp.maximum(jnp.sum(w, axis=1), 1e-3)
        mean = jnp.sum(feat * w, axis=1) / denom
        var = jnp.sum((feat - mean[:, None, :]) ** 2 * w, axis=1) / denom
        stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-6)], axis=-1)

        emb = nn.Dense(cfg.embedding_dim, dtype=dt, name="embed")(stats)
        return emb.astype(jnp.float32)


def make_fbank_frontend() -> MelFrontend:
    """80-mel fbank used by the embedding path (reference FBank CoreML)."""
    return MelFrontend(MelConfig(n_mels=80, normalize=None))
