"""RNN-T prediction network (LSTM) + joint network, for TDT/RNN-T decode.

Explicit JAX equivalents of the reference's opaque "decoder" and "joint"
CoreML graphs (`TDT/TdtModelInference.swift:26-84`, decoder state layout at
`TDT/Decoder/TdtDecoderState.swift:5-99`: LSTM h/c [layers, 1, 640] +
lastToken + cached predictor projection).

Versions (reference `TDT/AsrModels.swift:5-54`):
  v2: vocab 1024, blank 1024, 2-layer LSTM 640;  v3: vocab 8192, blank 8192,
  1-layer LSTM 640. TDT joint emits vocab+1 token logits then `n_durations`
  duration logits (bins [0..4], `TDT/Decoder/TdtConfig.swift`).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PredictorConfig:
    vocab_size: int = 8192  # excludes blank
    pred_hidden: int = 640
    n_layers: int = 1
    enc_hidden: int = 1024
    joint_hidden: int = 640
    n_durations: int = 5  # TDT duration bins [0,1,2,3,4]; 0 => pure RNN-T
    dtype: str = "float32"

    @property
    def blank_id(self) -> int:
        return self.vocab_size

    @property
    def num_token_logits(self) -> int:
        return self.vocab_size + 1

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


PARAKEET_V3_PRED = PredictorConfig(vocab_size=8192, n_layers=1)
PARAKEET_V2_PRED = PredictorConfig(vocab_size=1024, n_layers=2)
EOU_PRED = PredictorConfig(vocab_size=1024, n_layers=1, enc_hidden=512, n_durations=0)


class LstmCell(nn.Module):
    """Single LSTM step: (x [B, I], h [B, H], c [B, H]) -> (h', c')."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, c):
        z = (
            nn.Dense(4 * self.hidden, dtype=self.dtype, name="ih")(x)
            + nn.Dense(4 * self.hidden, dtype=self.dtype, name="hh")(h)
        )
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new


class RnntPredictor(nn.Module):
    """Embedding + stacked LSTM. One autoregressive step per call.

    Token `blank_id` (== vocab_size) acts as SOS and embeds to zeros, matching
    NeMo's blank-as-pad prediction network.
    """

    cfg: PredictorConfig

    @nn.compact
    def __call__(
        self, tokens: jax.Array, h: jax.Array, c: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """tokens [B] int32, h/c [L, B, H] -> (g [B, H], h', c')."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        embed = self.param(
            "embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size + 1, cfg.pred_hidden),
            jnp.float32,
        )
        # blank/SOS embeds to zeros (padding_idx semantics)
        table = embed.at[cfg.blank_id].set(0.0).astype(dt)
        x = table[tokens]
        new_h, new_c = [], []
        for layer in range(cfg.n_layers):
            hl, cl = LstmCell(cfg.pred_hidden, dt, name=f"lstm{layer}")(
                x, h[layer], c[layer]
            )
            new_h.append(hl)
            new_c.append(cl)
            x = hl
        return x, jnp.stack(new_h), jnp.stack(new_c)

    def init_state(self, batch: int) -> tuple[jax.Array, jax.Array]:
        z = jnp.zeros((self.cfg.n_layers, batch, self.cfg.pred_hidden), self.cfg.compute_dtype)
        return z, z


class RnntJoint(nn.Module):
    """Additive joint: out(relu(enc_proj(f) + pred_proj(g))).

    Output layout: [vocab+1 token logits (blank last) | n_durations logits].
    `project_encoder` / `project_predictor` let decode loops cache projections
    (the reference caches the decoder projection across blank steps,
    `TdtModelInference.swift:26-84`).
    """

    cfg: PredictorConfig

    def setup(self):
        dt = self.cfg.compute_dtype
        self.enc_proj = nn.Dense(self.cfg.joint_hidden, dtype=dt, name="enc_proj")
        self.pred_proj = nn.Dense(self.cfg.joint_hidden, dtype=dt, name="pred_proj")
        self.out = nn.Dense(
            self.cfg.num_token_logits + self.cfg.n_durations, dtype=dt, name="out"
        )

    def __call__(self, f: jax.Array, g: jax.Array) -> jax.Array:
        return self.out(nn.relu(self.enc_proj(f) + self.pred_proj(g)))

    def project_encoder(self, f: jax.Array) -> jax.Array:
        return self.enc_proj(f)

    def project_predictor(self, g: jax.Array) -> jax.Array:
        return self.pred_proj(g)

    def from_projected(self, f_proj: jax.Array, g_proj: jax.Array) -> jax.Array:
        return self.out(nn.relu(f_proj + g_proj))
