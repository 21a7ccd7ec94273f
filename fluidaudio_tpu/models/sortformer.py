"""Sortformer-style end-to-end streaming diarizer (4 fixed speaker slots).

Explicit JAX equivalent of the reference's Sortformer CoreML graphs
(`Sortformer/SortformerDiarizer.swift:12`, `SortformerModelInference.swift:
24-46`): chunked conformer encoder + transformer head over
[speaker-cache | FIFO | chunk] context producing per-frame 4-speaker sigmoid
activities; carried state = spkcache [188, D] (compressed history) + FIFO
[40, D] (recent frames). Offline variant: one fused pass per 30.72 s window,
no state (`Sortformer/Offline/OfflineSortformerDiarizer.swift:215`).

TPU design: the chunk step (encode + transformer + prediction + cache/FIFO
update incl. top-K compression) is ONE jitted function; caches are fixed-shape
carried arrays with valid-length masks (SURVEY §5 "fixed-shape ring/FIFO
caches as pure carried arrays").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NUM_SPEAKERS = 4
FRAME_SECONDS = 0.08  # 80 ms encoder frames


@dataclass(frozen=True)
class SortformerConfig:
    n_mels: int = 128
    d_model: int = 192  # transformer/context width (post-projection)
    encoder_d_model: int = 512
    n_encoder_layers: int = 17
    n_transformer_layers: int = 18
    n_heads: int = 8
    spkcache_len: int = 188
    fifo_len: int = 40
    chunk_frames: int = 6  # encoder frames per streaming step (~0.48 s)
    # NeMo's updater compresses the speaker cache every `update_period`
    # FIFO pops; this port compresses whenever frames pop (every step with
    # overflow), which subsumes the periodic schedule on fixed-size chunks —
    # kept for converter/config parity with upstream presets
    update_period: int = 31
    dtype: str = "float32"

    # reference constraint floors (`SortformerTypes.swift` init clamping):
    # chunkLen >= 1; spkcacheLen >= (1 + silFramesPerSpk) * numSpeakers = 16;
    # updatePeriod in [chunkLen, fifoLen + chunkLen]
    def __post_init__(self):
        object.__setattr__(self, "chunk_frames", max(1, self.chunk_frames))
        object.__setattr__(self, "spkcache_len", max(16, self.spkcache_len))
        clamped = max(
            min(self.update_period, self.fifo_len + self.chunk_frames),
            self.chunk_frames,
        )
        object.__setattr__(self, "update_period", clamped)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def per_speaker_quota(self) -> int:
        return self.spkcache_len // NUM_SPEAKERS  # 47

    @property
    def frame_duration_seconds(self) -> float:
        return FRAME_SECONDS

    def is_compatible(self, other: "SortformerConfig") -> bool:
        """Same state-tensor shapes => streaming states are interchangeable
        (reference `SortformerConfig.isCompatible(with:)`)."""
        return (
            self.spkcache_len == other.spkcache_len
            and self.fifo_len == other.fifo_len
            and self.chunk_frames == other.chunk_frames
            and self.d_model == other.d_model
        )


# presets (reference SortformerTypes.swift:9-180)
SORTFORMER_V2 = SortformerConfig()
SORTFORMER_TEST = SortformerConfig(
    n_mels=16, d_model=32, encoder_d_model=32, n_encoder_layers=1,
    n_transformer_layers=2, n_heads=4, spkcache_len=16, fifo_len=8,
    chunk_frames=4, update_period=2,
)


class SortformerState(NamedTuple):
    spkcache: jax.Array  # [B, spkcache_len, D]
    spkcache_preds: jax.Array  # [B, spkcache_len, 4] last compression scores
    # (informational carry: compression itself always rescores the cache
    # with the current pass's predictions — `spk_preds` below)
    spkcache_mask: jax.Array  # [B, spkcache_len] bool (valid slots; non-contiguous)
    fifo: jax.Array  # [B, fifo_len, D]
    fifo_preds: jax.Array  # [B, fifo_len, 4]
    fifo_len_valid: jax.Array  # [B]


def init_state(cfg: SortformerConfig, batch: int) -> SortformerState:
    dt = cfg.compute_dtype
    return SortformerState(
        spkcache=jnp.zeros((batch, cfg.spkcache_len, cfg.d_model), dt),
        spkcache_preds=jnp.zeros((batch, cfg.spkcache_len, NUM_SPEAKERS), jnp.float32),
        spkcache_mask=jnp.zeros((batch, cfg.spkcache_len), bool),
        fifo=jnp.zeros((batch, cfg.fifo_len, cfg.d_model), dt),
        fifo_preds=jnp.zeros((batch, cfg.fifo_len, NUM_SPEAKERS), jnp.float32),
        fifo_len_valid=jnp.zeros((batch,), jnp.int32),
    )


class _NemoTfBlock(nn.Module):
    """NeMo TransformerEncoder layer (post-LN default): separate q/k/v/out
    projections (`first_sub_layer.{query,key,value}_net/out_projection`),
    then ReLU feed-forward (`second_sub_layer.dense_in/dense_out`), each
    sublayer followed by its layer norm on the residual sum. Convertible via
    `convert/sortformer.py`."""

    d: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask):
        dt = self.dtype
        B, N, _ = x.shape
        hd = self.d // self.heads
        q = nn.Dense(self.d, dtype=dt, name="q")(x).reshape(B, N, self.heads, hd)
        k = nn.Dense(self.d, dtype=dt, name="k")(x).reshape(B, N, self.heads, hd)
        v = nn.Dense(self.d, dtype=dt, name="v")(x).reshape(B, N, self.heads, hd)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
        scores = jnp.where(mask, scores, jnp.finfo(dt).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        att = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(B, N, self.d)
        x = nn.LayerNorm(dtype=dt, name="ln1")(
            x + nn.Dense(self.d, dtype=dt, name="out")(att))
        f = nn.relu(nn.Dense(self.d * 4, dtype=dt, name="ffn_in")(x))
        return nn.LayerNorm(dtype=dt, name="ln2")(
            x + nn.Dense(self.d, dtype=dt, name="ffn_out")(f))


class SortformerModel(nn.Module):
    """Shared trunk for streaming and offline passes — NeMo Sortformer layout:
    FastConformer encoder (reuses models/conformer.ConformerEncoder, the same
    NeMo-parity blocks the Parakeet converter targets) -> encoder_proj ->
    NeMo transformer encoder stack -> first_hidden_to_hidden ReLU ->
    single_hidden_to_spks sigmoid head (4 sorted speaker slots)."""

    cfg: SortformerConfig = SORTFORMER_V2

    def setup(self):
        from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder

        cfg = self.cfg
        dt = cfg.compute_dtype
        self.encoder = ConformerEncoder(
            ConformerConfig(
                n_mels=cfg.n_mels,
                d_model=cfg.encoder_d_model,
                n_layers=cfg.n_encoder_layers,
                n_heads=cfg.n_heads,
                subsampling_channels=(256 if cfg.encoder_d_model >= 256
                                      else cfg.encoder_d_model),
                dtype=cfg.dtype,
            ),
            name="encoder",
        )
        self.encoder_proj = nn.Dense(cfg.d_model, dtype=dt, name="encoder_proj")
        self.tf_blocks = [
            _NemoTfBlock(cfg.d_model, cfg.n_heads, dt, name=f"tf{i}")
            for i in range(cfg.n_transformer_layers)
        ]
        self.hidden_fc = nn.Dense(cfg.d_model, dtype=dt, name="hidden_fc")
        self.head = nn.Dense(NUM_SPEAKERS, dtype=dt, name="head")

    def encode_frames(self, mel: jax.Array) -> jax.Array:
        """mel [B, n_mels, T_mel] -> frames [B, T_mel//8, d_model]."""
        B, _, T_mel = mel.shape
        lengths = jnp.full((B,), T_mel, jnp.int32)
        enc, _ = self.encoder(mel, lengths)
        return self.encoder_proj(enc.astype(self.cfg.compute_dtype))

    def predict(self, context: jax.Array, context_mask: jax.Array) -> jax.Array:
        """context [B, N, d_model] (+bool mask [B, N]) -> sigmoid preds [B, N, 4]."""
        att = context_mask[:, None, None, :] & context_mask[:, None, :, None]
        x = context
        for blk in self.tf_blocks:
            x = blk(x, att)
        hidden = nn.relu(self.hidden_fc(x))
        logits = self.head(hidden)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    def __call__(self, mel: jax.Array) -> jax.Array:
        """Offline fused pass: mel [B, n_mels, T] -> preds [B, T//8, 4]."""
        frames = self.encode_frames(mel)
        B, T, _ = frames.shape
        return self.predict(frames, jnp.ones((B, T), bool))


def streaming_step(
    model: SortformerModel,
    params,
    mel_chunk: jax.Array,
    state: SortformerState,
    cfg: SortformerConfig,
) -> tuple[jax.Array, SortformerState]:
    """One chunk: returns (chunk preds [B, chunk_frames, 4], new state).

    Context = [spkcache | fifo | chunk]; after prediction the chunk enters the
    FIFO; overflow frames are compressed into the speaker cache by keeping the
    top-scoring frames per speaker (NeMo SortformerStateUpdater semantics,
    update period handled by quota-based eviction).
    """
    frames = model.apply(params, mel_chunk, method=SortformerModel.encode_frames)
    return streaming_step_from_frames(model, params, frames, state, cfg)


def streaming_scan_program(
    model: SortformerModel,
    params,
    mel_chunks: jax.Array,
    state: SortformerState,
    cfg: SortformerConfig,
) -> tuple[jax.Array, SortformerState]:
    """Whole-recording streaming pass in ONE jit (B=1 state).

    mel_chunks [N, n_mels, chunk_frames*8]: the conformer encoder is
    STATELESS per chunk, so all N chunks encode as one batched call on the
    MXU; only the transformer-over-[spkcache|fifo|chunk] + cache update —
    the truly stateful part — runs under `lax.scan`. Replaces the
    reference's one-CoreML-call-per-0.48 s loop
    (`SortformerDiarizer.swift` process loop) with a single dispatch.

    Returns (preds [N, chunk_frames, 4], final state).
    """
    frames_all = model.apply(
        params, mel_chunks, method=SortformerModel.encode_frames
    )  # [N, T, D]

    def body(st, fr):
        preds, st2 = streaming_step_from_frames(model, params, fr[None], st, cfg)
        return st2, preds[0]

    final, preds = jax.lax.scan(body, state, frames_all)
    return preds, final


def streaming_step_from_frames(
    model: SortformerModel,
    params,
    frames: jax.Array,
    state: SortformerState,
    cfg: SortformerConfig,
) -> tuple[jax.Array, SortformerState]:
    """`streaming_step` after the (stateless) encoder: frames [B, T, D]."""
    B, T, D = frames.shape
    S, F = cfg.spkcache_len, cfg.fifo_len

    context = jnp.concatenate([state.spkcache, state.fifo, frames], axis=1)
    pos = jnp.arange(S + F + T)[None, :]
    fifo_region = (pos >= S) & (pos < S + state.fifo_len_valid[:, None])
    chunk_region = jnp.broadcast_to(pos >= S + F, (B, S + F + T))
    spk_region = jnp.concatenate(
        [state.spkcache_mask, jnp.zeros((B, F + T), bool)], axis=1
    )
    mask = spk_region | fifo_region | chunk_region
    preds = model.apply(params, context, mask, method=SortformerModel.predict)
    chunk_preds = preds[:, S + F :]

    # refresh cached scores with this pass's predictions
    spk_preds = preds[:, :S]
    fifo_preds = preds[:, S : S + F]

    # --- FIFO update: append chunk, pop overflow into the compressor -------
    # Valid FIFO frames stay left-compacted: logical content j is fifo[j] for
    # j < valid_len, else frames[j - valid_len] (the padded fifo tail never
    # enters the logical stream).
    valid_len = state.fifo_len_valid  # [B]
    j = jnp.arange(F + T)[None, :]  # [1, F+T]
    from_fifo = jnp.take_along_axis(
        state.fifo, jnp.clip(j, 0, F - 1)[..., None], axis=1
    )
    from_frames = jnp.take_along_axis(
        frames, jnp.clip(j - valid_len[:, None], 0, T - 1)[..., None], axis=1
    )
    in_fifo = (j < valid_len[:, None])[..., None]
    in_frames = (j < (valid_len[:, None] + T))[..., None]
    content = jnp.where(in_fifo, from_fifo, jnp.where(in_frames, from_frames, 0.0))

    fp_from_fifo = jnp.take_along_axis(
        fifo_preds, jnp.clip(j, 0, F - 1)[..., None], axis=1
    )  # REFRESHED this pass (full [spkcache|fifo|chunk] context), not the
    # stale per-entry scores from the step each frame entered the FIFO
    fp_from_frames = jnp.take_along_axis(
        chunk_preds, jnp.clip(j - valid_len[:, None], 0, T - 1)[..., None], axis=1
    )
    content_preds = jnp.where(in_fifo, fp_from_fifo, jnp.where(in_frames, fp_from_frames, 0.0))

    total = valid_len + T
    overflow = jnp.maximum(total - F, 0)  # [B]
    new_fifo_valid = jnp.minimum(total, F)
    i = jnp.arange(F)[None, :]
    shifted = jnp.clip(i + overflow[:, None], 0, F + T - 1)
    new_fifo = jnp.take_along_axis(content, shifted[..., None], axis=1)
    new_fifo_preds = jnp.take_along_axis(content_preds, shifted[..., None], axis=1)
    fifo_keep = (i < new_fifo_valid[:, None])[..., None]
    new_fifo = jnp.where(fifo_keep, new_fifo, 0.0)
    new_fifo_preds = jnp.where(fifo_keep, new_fifo_preds, 0.0)

    # popped frames: the first `overflow` entries of the logical content
    max_pop = T  # at most T frames pop per step
    pop_idx = jnp.arange(max_pop)[None, :]
    popped_valid = pop_idx < overflow[:, None]
    popped = content[:, :max_pop]
    popped_preds = content_preds[:, :max_pop]

    # --- speaker-cache compression: keep top-quota frames per speaker ------
    quota = cfg.per_speaker_quota
    cand = jnp.concatenate([state.spkcache, popped], axis=1)  # [B, S+P, D]
    cand_preds = jnp.concatenate([spk_preds, popped_preds], axis=1)
    cand_valid = jnp.concatenate([state.spkcache_mask, popped_valid], axis=1)
    scores = jnp.where(cand_valid[..., None], cand_preds, -1.0)  # [B, S+P, 4]

    def build_cache(scores_b, cand_b, preds_b):
        slots, slot_preds, slot_valid = [], [], []
        for s in range(NUM_SPEAKERS):
            _, top = jax.lax.top_k(scores_b[:, s], quota)
            order = jnp.sort(top)  # keep temporal order within the slot block
            slots.append(cand_b[order])
            slot_preds.append(preds_b[order])
            slot_valid.append(scores_b[order, s] >= 0.0)
        return (
            jnp.concatenate(slots, axis=0),
            jnp.concatenate(slot_preds, axis=0),
            jnp.concatenate(slot_valid, axis=0),
        )

    new_spk, new_spk_preds, new_spk_mask = jax.vmap(build_cache)(scores, cand, cand_preds)

    new_state = SortformerState(
        spkcache=new_spk,
        spkcache_preds=new_spk_preds,
        spkcache_mask=new_spk_mask,
        fifo=new_fifo,
        fifo_preds=new_fifo_preds,
        fifo_len_valid=new_fifo_valid,
    )
    return chunk_preds, new_state
