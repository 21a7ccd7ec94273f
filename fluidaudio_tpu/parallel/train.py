"""Sharded training step (CTC fine-tuning of the conformer encoder).

The reference ships no training code (SURVEY.md intro); this exists so the
framework can fine-tune/adapt its explicit JAX models and to exercise the full
dp+tp sharding path end-to-end (the driver's `dryrun_multichip`). Loss is CTC
over encoder outputs (optax.ctc_loss); optimizer adamw; gradients flow through
the mel frontend boundary (mel is precomputed, encoder is trained).

Sharding: batch over 'data', tensor-parallel kernels over 'model'
(parallel/mesh.param_sharding_rules); `jax.jit` + NamedShardings => GSPMD
inserts the ICI collectives (psum of grads over 'data', all-gathers for tp).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(
    rng: jax.Array,
    cfg: ConformerConfig,
    vocab_size: int,
    mel_frames: int,
    learning_rate: float = 1e-4,
) -> tuple[TrainState, Any, optax.GradientTransformation]:
    """Init encoder + CTC head params and adamw optimizer."""
    encoder = ConformerEncoder(cfg)
    mel = jnp.zeros((2, cfg.n_mels, mel_frames), jnp.float32)
    lengths = jnp.full((2,), mel_frames, jnp.int32)
    enc_params = encoder.init(rng, mel, lengths)
    head = jax.random.normal(rng, (cfg.d_model, vocab_size + 1), jnp.float32) * 0.02
    params = {"encoder": enc_params, "ctc_head": head}
    tx = optax.adamw(learning_rate)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), encoder, tx


def make_train_step(encoder: ConformerEncoder, tx: optax.GradientTransformation,
                    blank_id: int):
    """Returns a jittable (state, batch) -> (state, metrics) function."""

    def loss_fn(params, mel, mel_lengths, labels, label_lengths):
        enc, enc_lengths = encoder.apply(params["encoder"], mel, mel_lengths)
        logits = enc @ params["ctc_head"]  # [B, T, V+1]
        B, T, _ = logits.shape
        logit_pad = (
            jnp.arange(T, dtype=jnp.int32)[None, :] >= enc_lengths[:, None]
        ).astype(jnp.float32)
        label_pad = (
            jnp.arange(labels.shape[1], dtype=jnp.int32)[None, :]
            >= label_lengths[:, None]
        ).astype(jnp.float32)
        per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=blank_id)
        return jnp.mean(per_seq)

    def train_step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params,
            batch["mel"],
            batch["mel_lengths"],
            batch["labels"],
            batch["label_lengths"],
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return train_step


def jit_sharded_train_step(
    mesh: Mesh, encoder: ConformerEncoder, tx, blank_id: int, state: TrainState
):
    """jit the train step with dp ('data') batch + tp ('model') params."""
    from fluidaudio_tpu.parallel.mesh import param_sharding_rules

    step_fn = make_train_step(encoder, tx, blank_id)
    param_sh = param_sharding_rules(mesh, state.params)
    opt_sh = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P()), state.opt_state
    )
    state_sh = TrainState(param_sh, opt_sh, NamedSharding(mesh, P()))
    batch_sh = {
        "mel": NamedSharding(mesh, P("data", None, None)),
        "mel_lengths": NamedSharding(mesh, P("data")),
        "labels": NamedSharding(mesh, P("data", None)),
        "label_lengths": NamedSharding(mesh, P("data")),
    }
    metrics_sh = {"loss": NamedSharding(mesh, P())}
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, metrics_sh),
    )
