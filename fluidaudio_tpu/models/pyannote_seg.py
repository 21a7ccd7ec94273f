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


# --------------------------------------------------------------------------
# Checkpoint-convertible PyanNet (upstream pyannote/segmentation-3.0 layout)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class PyanNetConfig:
    """pyannote.audio PyanNet hyperparameters (segmentation-3.0)."""

    sinc_filters: int = 80
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_channels: int = 60
    conv_kernel: int = 5
    pool: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_dims: tuple[int, ...] = (128, 128)
    n_classes: int = POWERSET_CLASSES
    dtype: str = "float32"


class _InstanceNorm(nn.Module):
    """InstanceNorm1d(affine=True) at inference: per-sample, per-channel
    normalization over time (pyannote's SincNet uses track_running_stats=False,
    so train and eval both normalize with batch-item statistics)."""

    ch: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        scale = self.param("scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class _LstmLayer(nn.Module):
    """Unidirectional full-sequence LSTM via nn.scan (torch i,f,g,o gates)."""

    hidden: int

    @nn.compact
    def __call__(self, x):  # [B, T, I] -> [B, T, H]
        class Step(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self, carry, xt):
                h, c = carry
                z = (nn.Dense(4 * self.hidden, name="ih")(xt)
                     + nn.Dense(4 * self.hidden, name="hh")(h))
                i, f, g, o = jnp.split(z, 4, axis=-1)
                c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
                return (h2, c2), h2

        scan = nn.scan(Step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        B = x.shape[0]
        zeros = jnp.zeros((B, self.hidden), x.dtype)
        _, ys = scan(self.hidden, name="cell")((zeros, zeros), x)
        return ys


class PyanNet(nn.Module):
    """Exact pyannote PyanNet: waveform [B, 160000] -> logits [B, 589, 7].

    Convertible from upstream torch checkpoints via `convert/pyannote.py`
    (SincNet filters materialized from low_hz_/band_hz_ at conversion time).
    Forward order matches pyannote.audio `models/blocks/sincnet.py` /
    `models/segmentation/PyanNet.py`: wav-instancenorm, then per block
    conv -> (abs on block 0) -> maxpool -> instancenorm -> leaky_relu; then
    4-layer BiLSTM, two leaky_relu linears, classifier. Upstream applies
    log_softmax; we return logits (argmax-invariant for powerset decoding).
    """

    cfg: PyanNetConfig = PyanNetConfig()

    @nn.compact
    def __call__(self, waveform: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = waveform[:, :, None].astype(dt)  # [B, T, 1]
        x = _InstanceNorm(1, name="wav_norm")(x)

        # block 0: sinc conv (materialized) -> |.| -> pool -> norm -> leaky
        x = nn.Conv(cfg.sinc_filters, (cfg.sinc_kernel,),
                    strides=(cfg.sinc_stride,), padding="VALID",
                    use_bias=False, dtype=dt, name="sinc")(x)
        x = jnp.abs(x)
        x = nn.max_pool(x, (cfg.pool,), strides=(cfg.pool,))
        x = nn.leaky_relu(_InstanceNorm(cfg.sinc_filters, name="norm0")(x))

        # blocks 1-2: conv5 -> pool -> norm -> leaky
        for i in (1, 2):
            x = nn.Conv(cfg.conv_channels, (cfg.conv_kernel,), padding="VALID",
                        dtype=dt, name=f"conv{i}")(x)
            x = nn.max_pool(x, (cfg.pool,), strides=(cfg.pool,))
            x = nn.leaky_relu(_InstanceNorm(cfg.conv_channels, name=f"norm{i}")(x))

        # 4-layer BiLSTM
        for l in range(cfg.lstm_layers):
            fwd = _LstmLayer(cfg.lstm_hidden, name=f"lstm{l}_fwd")(x)
            bwd = _LstmLayer(cfg.lstm_hidden, name=f"lstm{l}_bwd")(
                x[:, ::-1])[:, ::-1]
            x = jnp.concatenate([fwd, bwd], axis=-1)

        for i, dim in enumerate(cfg.linear_dims):
            x = nn.leaky_relu(nn.Dense(dim, dtype=dt, name=f"linear{i}")(x))
        return nn.Dense(cfg.n_classes, dtype=dt,
                        name="classifier")(x).astype(jnp.float32)


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
