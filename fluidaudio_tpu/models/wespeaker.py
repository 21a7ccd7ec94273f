"""Speaker embedding network (WeSpeaker-style ResNet + masked stats pooling).

Explicit JAX equivalent of the reference's embedding CoreML graph:
waveform [S, 160000] + frame mask [S, 589] -> embeddings [S, 256]
(`Diarizer/Extraction/EmbeddingExtractor.swift:27-115`). Internally: 80-mel
fbank -> 2D ResNet trunk -> mask-weighted statistics pooling -> 256-d linear.

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
    blocks_per_stage: int = 2
    embedding_dim: int = EMBEDDING_DIM
    dtype: str = "float32"


class _ResBlock(nn.Module):
    ch: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", dtype=dt, name="conv1")(x)
        h = nn.relu(nn.LayerNorm(dtype=dt, name="ln1")(h))
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=dt, name="conv2")(h)
        h = nn.LayerNorm(dtype=dt, name="ln2")(h)
        if x.shape[-1] != self.ch or self.stride != 1:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                        padding="SAME", dtype=dt, name="short")(x)
        return nn.relu(x + h)


class WeSpeakerEmbedder(nn.Module):
    """(mel [S, T, n_mels], frame_weights [S, T]) -> embeddings [S, 256]."""

    cfg: WeSpeakerConfig = WeSpeakerConfig()

    @nn.compact
    def __call__(self, mel: jax.Array, frame_weights: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = mel[..., None].astype(dt)  # [S, T, F, 1]
        for si, ch in enumerate(cfg.channels):
            for bi in range(cfg.blocks_per_stage):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = _ResBlock(ch, stride, dt, name=f"s{si}b{bi}")(x)
        S, T, F, C = x.shape
        feat = x.reshape(S, T, F * C)

        # mask-weighted statistics pooling over time
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
