"""Speaker segmentation network (pyannote-style powerset), TPU-native.

Explicit JAX equivalent of the reference's segmentation CoreML graph:
waveform [B, 160000] (10 s) -> powerset logits [B, 589, 7]
(`Diarizer/Segmentation/SegmentationProcessor.swift:25-141`; powerset classes
{∅, S1, S2, S3, S1S2, S1S3, S2S3}, table at :113-121).

Architecture: learned filterbank conv stem (SincNet role) + strided conv
stack to exactly 589 frames (~17 ms hop), then bidirectional-LSTM-equivalent
modeled as a stack of temporal convs + a small self-attention block (TPU-first:
recurrences replaced by parallel context ops with the same receptive field),
linear head to the 7 powerset classes.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

POWERSET_CLASSES = 7
NUM_SPEAKERS = 3
WINDOW_SAMPLES = 160_000  # 10 s
NUM_FRAMES = 589

# class -> active speaker bitmask over 3 slots (reference powerset table)
POWERSET_TABLE = np.array(
    [
        [0, 0, 0],  # silence
        [1, 0, 0],  # S1
        [0, 1, 0],  # S2
        [0, 0, 1],  # S3
        [1, 1, 0],  # S1+S2
        [1, 0, 1],  # S1+S3
        [0, 1, 1],  # S2+S3
    ],
    dtype=np.float32,
)


@dataclass(frozen=True)
class SegmentationConfig:
    conv_channels: tuple[int, ...] = (80, 128, 128, 128)
    d_model: int = 128
    n_attention_layers: int = 2
    n_heads: int = 4
    dtype: str = "float32"


class PyannoteSegmentation(nn.Module):
    """waveform [B, 160000] -> (logits [B, 589, 7])."""

    cfg: SegmentationConfig = SegmentationConfig()

    @nn.compact
    def __call__(self, waveform: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = waveform[:, :, None].astype(dt)  # [B, T, 1]

        # stem: learned filterbank, stride 10 (~0.6ms) -> [B, 16000, 80]
        x = nn.Conv(cfg.conv_channels[0], (251,), strides=(10,), padding="SAME",
                    dtype=dt, name="stem")(x)
        x = nn.relu(jnp.abs(x))
        # 3 stride-3 conv+pool stages: 16000 -> 5334 -> 1778 -> 593
        for i, ch in enumerate(cfg.conv_channels[1:]):
            x = nn.Conv(ch, (5,), strides=(3,), padding="SAME", dtype=dt,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(dtype=dt, name=f"ln{i}")(x)
        # trim/pad to exactly NUM_FRAMES
        T = x.shape[1]
        if T >= NUM_FRAMES:
            x = x[:, :NUM_FRAMES]
        else:
            x = jnp.pad(x, ((0, 0), (0, NUM_FRAMES - T), (0, 0)))

        # temporal context: small full-attention blocks (10 s => 589 frames)
        for i in range(cfg.n_attention_layers):
            h = nn.LayerNorm(dtype=dt, name=f"att_ln{i}")(x)
            h = nn.SelfAttention(num_heads=cfg.n_heads, dtype=dt,
                                 name=f"att{i}")(h)
            x = x + h
            f = nn.LayerNorm(dtype=dt, name=f"ffn_ln{i}")(x)
            f = nn.Dense(cfg.d_model * 4, dtype=dt, name=f"ffn1_{i}")(f)
            f = nn.gelu(f)
            f = nn.Dense(cfg.d_model, dtype=dt, name=f"ffn2_{i}")(f)
            x = x + f

        x = nn.Dense(cfg.d_model, dtype=dt, name="proj")(x)
        x = nn.tanh(x)
        return nn.Dense(POWERSET_CLASSES, dtype=dt, name="head")(x).astype(jnp.float32)


def powerset_to_binary(logits: jax.Array) -> jax.Array:
    """[B, T, 7] powerset logits -> [B, T, 3] binary speaker activity (argmax)."""
    classes = jnp.argmax(logits, axis=-1)  # [B, T]
    table = jnp.asarray(POWERSET_TABLE)
    return table[classes]  # [B, T, 3]


def clean_frame_mask(binary: jax.Array) -> jax.Array:
    """[B, T, 3] -> [B, T] mask of frames with at most one active speaker.

    Reference excludes overlap frames from embedding extraction
    (`DiarizerManager.swift:314-325`: speakerSum < 2).
    """
    return jnp.sum(binary, axis=-1) < 2
