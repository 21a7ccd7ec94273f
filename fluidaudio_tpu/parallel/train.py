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
    k_enc, k_head = jax.random.split(rng)
    enc_params = encoder.init(k_enc, mel, lengths)
    head = jax.random.normal(k_head, (cfg.d_model, vocab_size + 1), jnp.float32) * 0.02
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


def _opt_state_shardings(mesh, opt_state, params, param_sh):
    """Shard param-shaped optimizer leaves (adamw mu/nu) like their params.

    Fully-replicated opt state would store two unsharded copies of every
    tp-sharded kernel per device and reshard around tx.update each step.
    """
    flat_params = {
        tuple(str(getattr(k, "key", k)) for k in path): sh
        for path, sh in jax.tree_util.tree_flatten_with_path(param_sh)[0]
    }

    def leaf_sharding(path, leaf):
        # adamw state nests a params-shaped tree under ScaleByAdamState.mu/nu;
        # match by the trailing path components
        key = tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
        for plen in range(len(key), 0, -1):
            cand = key[-plen:]
            if cand in flat_params and flat_params[cand].spec is not None:
                return flat_params[cand]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, opt_state)


def jit_sharded_train_step(
    mesh: Mesh, encoder: ConformerEncoder, tx, blank_id: int, state: TrainState
):
    """jit the train step with dp ('data') batch + tp ('model') params."""
    from fluidaudio_tpu.parallel.mesh import param_sharding_rules

    step_fn = make_train_step(encoder, tx, blank_id)
    param_sh = param_sharding_rules(mesh, state.params)
    opt_sh = _opt_state_shardings(mesh, state.opt_state, state.params, param_sh)
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


# --------------------------------------------------------------------------
# TDT transducer training (encoder + predictor + joint, train/transducer_loss)
# --------------------------------------------------------------------------


class TransducerTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_tdt_train_state(
    rng: jax.Array,
    ccfg: ConformerConfig,
    pcfg,
    mel_frames: int,
    learning_rate: float = 1e-4,
):
    """Init the full TDT stack (encoder + predictor + joint) and adamw."""
    from fluidaudio_tpu.models.predictor import RnntJoint, RnntPredictor

    encoder = ConformerEncoder(ccfg)
    predictor = RnntPredictor(pcfg)
    joint = RnntJoint(pcfg)

    k1, k2, k3 = jax.random.split(rng, 3)
    mel = jnp.zeros((2, ccfg.n_mels, mel_frames), jnp.float32)
    lengths = jnp.full((2,), mel_frames, jnp.int32)
    enc_params = encoder.init(k1, mel, lengths)
    h = jnp.zeros((pcfg.n_layers, 2, pcfg.pred_hidden), jnp.float32)
    pred_params = predictor.init(k2, jnp.zeros((2,), jnp.int32), h, h)
    joint_params = joint.init(
        k3, jnp.zeros((2, pcfg.enc_hidden)), jnp.zeros((2, pcfg.pred_hidden))
    )
    params = {"encoder": enc_params, "predictor": pred_params, "joint": joint_params}
    tx = optax.adamw(learning_rate)
    state = TransducerTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    return state, (encoder, predictor, joint), tx


def make_tdt_train_step(modules, pcfg, tx, durations: tuple[int, ...]):
    """Full-lattice TDT training step: teacher-forced predictor scan over
    label prefixes, additive joint over [B, T, U+1], train.tdt_loss."""
    from fluidaudio_tpu.models.predictor import RnntPredictor
    from fluidaudio_tpu.train.transducer_loss import tdt_loss

    encoder, predictor, joint = modules
    blank_id = pcfg.blank_id
    V = pcfg.num_token_logits

    def loss_fn(params, mel, mel_lengths, labels, label_lengths):
        enc, enc_lengths = encoder.apply(params["encoder"], mel, mel_lengths)
        B, T, _ = enc.shape
        U = labels.shape[1]

        # predictor over prefixes: SOS(blank) then each label -> g [B, U+1, H]
        tokens_in = jnp.concatenate(
            [jnp.full((B, 1), blank_id, jnp.int32), labels.astype(jnp.int32)], axis=1
        )  # [B, U+1]
        h0 = jnp.zeros((pcfg.n_layers, B, pcfg.pred_hidden), enc.dtype)

        def pred_step(carry, tok):
            h, c = carry
            g, h2, c2 = predictor.apply(params["predictor"], tok, h, c)
            return (h2, c2), g

        _, gs = jax.lax.scan(pred_step, (h0, h0), jnp.moveaxis(tokens_in, 1, 0))
        g = jnp.moveaxis(gs, 0, 1)  # [B, U+1, H]

        # joint over the lattice (broadcast additive form)
        logits = joint.apply(
            params["joint"], enc[:, :, None, :], g[:, None, :, :]
        )  # [B, T, U+1, V + D]
        tok_lp = jax.nn.log_softmax(logits[..., :V].astype(jnp.float32), axis=-1)
        dur_lp = jax.nn.log_softmax(logits[..., V:].astype(jnp.float32), axis=-1)
        per_seq = tdt_loss(tok_lp, dur_lp, durations, labels,
                           enc_lengths, label_lengths, blank_id)
        return jnp.mean(per_seq)

    def train_step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch["mel"], batch["mel_lengths"],
            batch["labels"], batch["label_lengths"],
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TransducerTrainState(params, opt_state, state.step + 1), {"loss": loss}

    return train_step


def jit_sharded_tdt_train_step(mesh: Mesh, modules, pcfg, tx,
                               durations: tuple[int, ...],
                               state: TransducerTrainState):
    """jit the TDT step with dp ('data') batch + tp ('model') params."""
    from fluidaudio_tpu.parallel.mesh import param_sharding_rules

    step_fn = make_tdt_train_step(modules, pcfg, tx, durations)
    param_sh = param_sharding_rules(mesh, state.params)
    opt_sh = _opt_state_shardings(mesh, state.opt_state, state.params, param_sh)
    state_sh = TransducerTrainState(param_sh, opt_sh, NamedSharding(mesh, P()))
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
