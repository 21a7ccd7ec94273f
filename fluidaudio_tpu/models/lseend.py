"""LS-EEND-style online end-to-end diarizer (<=10 speakers, recurrent).

Explicit JAX equivalent of the reference's LS-EEND CoreML graphs
(`LS-EEND/LSEENDDiarizer.swift:17`, `LSEENDPreprocessor.swift`,
`LSEENDInference.swift`): 8 kHz input, STFT -> log10-mel -> CMN -> subsample
with context stacking -> recurrent T-block carrying per-speaker attractor
state across steps; 100 ms frames; step sizes 100-500 ms; 900 ms warmup.

TPU design: one jitted step (frame encoder + frame<->attractor cross-attention
+ gated attractor update + sigmoid activity) with the attractor bank as a
carried [n_speakers, D] array.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MAX_SPEAKERS = 10
LSEEND_SAMPLE_RATE = 8_000
FRAME_SECONDS = 0.1  # 100 ms output frames


@dataclass(frozen=True)
class LsEendConfig:
    n_mels: int = 23
    context: int = 7  # stacked context frames each side
    subsample: int = 10  # 10 ms mel hop -> 100 ms output frames
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    warmup_frames: int = 9  # 900 ms
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def feat_dim(self) -> int:
        return self.n_mels * (2 * self.context + 1)


LSEEND_BASE = LsEendConfig()
LSEEND_TEST = LsEendConfig(n_mels=8, context=2, d_model=32, n_layers=1, n_heads=4)


class LsEendState(NamedTuple):
    attractors: jax.Array  # [B, MAX_SPEAKERS, D]
    frames_seen: jax.Array  # [B] int32 (for warmup gating)


def init_state(cfg: LsEendConfig, batch: int) -> LsEendState:
    return LsEendState(
        attractors=jnp.zeros((batch, MAX_SPEAKERS, cfg.d_model), cfg.compute_dtype),
        frames_seen=jnp.zeros((batch,), jnp.int32),
    )


def subsample_with_context(logmel: jax.Array, cfg: LsEendConfig) -> jax.Array:
    """[B, n_mels, T_mel] -> features [B, T_mel//subsample, feat_dim].

    Output frame t stacks mel frames t*sub - ctx .. t*sub + ctx (edge clamp).
    """
    B, F, T = logmel.shape
    x = jnp.transpose(logmel, (0, 2, 1))
    t_out = T // cfg.subsample
    centers = jnp.arange(t_out) * cfg.subsample + cfg.subsample // 2
    offsets = jnp.arange(-cfg.context, cfg.context + 1)
    idx = jnp.clip(centers[:, None] + offsets[None, :], 0, T - 1)  # [T', 2c+1]
    stacked = x[:, idx, :]  # [B, T', 2c+1, F]
    return stacked.reshape(B, t_out, cfg.feat_dim)


class LsEendModel(nn.Module):
    """One streaming step over a block of output frames."""

    cfg: LsEendConfig = LSEEND_BASE

    @nn.compact
    def __call__(self, feats: jax.Array, state: LsEendState):
        """feats [B, T, feat_dim] -> (activities [B, T, 10], new state)."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        B, T, _ = feats.shape
        x = nn.Dense(cfg.d_model, dtype=dt, name="input_proj")(feats.astype(dt))
        for i in range(cfg.n_layers):
            h = nn.LayerNorm(dtype=dt, name=f"ln{i}")(x)
            x = x + nn.SelfAttention(num_heads=cfg.n_heads, dtype=dt, name=f"att{i}")(h)
            f = nn.LayerNorm(dtype=dt, name=f"fln{i}")(x)
            f = nn.Dense(cfg.d_model * 4, dtype=dt, name=f"ff1_{i}")(f)
            f = nn.gelu(f)
            x = x + nn.Dense(cfg.d_model, dtype=dt, name=f"ff2_{i}")(f)

        # attractor update: slots attend the block's frames, gated (GRU-style)
        slot_init = self.param(
            "slot_init", nn.initializers.normal(0.02), (MAX_SPEAKERS, cfg.d_model),
            jnp.float32,
        )
        first_step = (state.frames_seen == 0)[:, None, None]
        attractors = jnp.where(
            first_step, slot_init[None].astype(dt), state.attractors
        )
        attended = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads, dtype=dt, name="slot_att"
        )(attractors, x)
        z = jax.nn.sigmoid(
            nn.Dense(cfg.d_model, dtype=dt, name="gate")(
                jnp.concatenate([attractors, attended], axis=-1)
            )
        )
        new_attractors = (1 - z) * attractors + z * jnp.tanh(
            nn.Dense(cfg.d_model, dtype=dt, name="cand")(attended)
        )

        # per-frame activity = sigmoid(frame . attractor)
        logits = jnp.einsum("btd,bsd->bts", x, new_attractors) / np.sqrt(cfg.d_model)
        activities = jax.nn.sigmoid(logits.astype(jnp.float32))
        # warmup: suppress outputs before warmup_frames
        seen = state.frames_seen[:, None] + jnp.arange(T)[None, :]
        activities = jnp.where(
            (seen >= cfg.warmup_frames)[..., None], activities, 0.0
        )
        new_state = LsEendState(
            attractors=new_attractors, frames_seen=state.frames_seen + T
        )
        return activities, new_state
