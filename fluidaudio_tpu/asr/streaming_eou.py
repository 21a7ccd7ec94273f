"""True-streaming ASR with end-of-utterance detection (EOU 120M family).

Behavioral parity: reference `Streaming/EOU/StreamingEouAsrManager.swift:
17-150,163-265,380-560` — chunk tiers 160/320/1280 ms, native mel feeding a
cache-aware loopback encoder (mel pre-cache + conformer channel/time caches),
incremental greedy RNN-T decode with EOU token (id 1024, blank 1026,
`RnntDecoder.swift:31-32`), EOU debounce (1280 ms), partial-transcript
callbacks, token timestamps in ms; `finish()` pads and flushes the tail.

TPU re-design: the reference crosses the host<->ANE boundary 3x per chunk
(encoder, decoder, joint); here mel -> encoder-step -> full RNN-T decode of
the chunk is ONE jitted function with all caches carried as arrays.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.multistream import MultiStreamMixin
from fluidaudio_tpu.asr.tokenizer import Tokenizer
from fluidaudio_tpu.models.conformer_streaming import (
    EOU_120M,
    StreamingCaches,
    StreamingConformerConfig,
    StreamingConformerEncoder,
    init_caches,
)
from fluidaudio_tpu.models.predictor import PredictorConfig, RnntJoint, RnntPredictor
from fluidaudio_tpu.models.zoo import _placeholder_vocab
from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend
from fluidaudio_tpu.ops.tdt_decode import (
    TdtDecodeConfig,
    TdtDecodeState,
    make_initial_state,
    tdt_greedy_decode,
)
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.logging import get_logger

logger = get_logger("asr.eou")

SAMPLE_RATE = 16_000
MEL_WIN = 400
MEL_HOP = 160
EOU_TOKEN_ID = 1024
EOU_BLANK_ID = 1026
EOU_DEBOUNCE_MS = 1280.0

# chunk tiers: ms -> samples consumed per step (mel frames = samples/160)
CHUNK_TIERS_MS = (160, 320, 1280)


@dataclass(frozen=True)
class EouSpec:
    """Model-size spec for the streaming EOU stack (reference ships one
    120M checkpoint; the test spec exists for hermetic trained fixtures —
    the zoo `test-tiny` pattern applied to the streaming family)."""

    enc_cfg: StreamingConformerConfig
    pred_hidden: int = 640
    joint_hidden: int = 640
    eou_token_id: int = EOU_TOKEN_ID
    blank_id: int = EOU_BLANK_ID  # == predictor vocab_size (blank last)


EOU_DEFAULT = EouSpec(EOU_120M)
EOU_TEST = EouSpec(
    StreamingConformerConfig(
        d_model=64, n_layers=2, n_heads=4, subsampling_channels=32,
        att_context_left=16,
    ),
    pred_hidden=64, joint_hidden=64,
    # tone words 0..15, EOU at 16, blank at 18 (== vocab_size)
    eou_token_id=16, blank_id=18,
)


def compute_token_timestamps_ms(
    base_frame: int, token_frames: list[int], frame_duration_ms: float = 80.0
) -> list[float]:
    """Per-token emission timestamps: (stream base frame + in-window frame)
    x 80 ms encoder frame (`StreamingEouAsrManager.computeTokenTimestampsMs`)."""
    return [(base_frame + f) * frame_duration_ms for f in token_frames]


@dataclass
class EouPartialResult:
    text: str
    token_ids: list[int]
    timestamps_ms: list[float]
    is_final: bool  # True when emitted at an EOU boundary
    eou_detected: bool


@dataclass
class _StreamState:
    pending: np.ndarray
    last_sample: float
    consumed_samples: int
    caches: StreamingCaches
    dec_state: TdtDecodeState
    tokens: list[int] = field(default_factory=list)
    timestamps_ms: list[float] = field(default_factory=list)
    last_eou_ms: float = -1e9
    enc_frames_emitted: int = 0
    # multilingual Nemotron: first <xx-XX> tag seen in THIS stream (per
    # state, so a manager reused across files never reports a stale value)
    detected_language: str | None = None


class StreamingEouAsrManager(MultiStreamMixin):
    def __init__(
        self,
        chunk_ms: int = 320,
        *,
        spec: EouSpec = EOU_DEFAULT,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
        on_partial: Callable[[EouPartialResult], None] | None = None,
        on_eou: Callable[[EouPartialResult], None] | None = None,
    ):
        assert chunk_ms in CHUNK_TIERS_MS, f"chunk_ms must be one of {CHUNK_TIERS_MS}"
        self.chunk_ms = chunk_ms
        self.chunk_samples = chunk_ms * SAMPLE_RATE // 1000
        self.mel_frames = self.chunk_samples // MEL_HOP
        self.on_partial = on_partial
        self.on_eou = on_eou

        self.spec = spec
        self.enc_cfg: StreamingConformerConfig = spec.enc_cfg
        self.encoder = StreamingConformerEncoder(self.enc_cfg)
        self.pred_cfg = PredictorConfig(
            vocab_size=spec.blank_id, pred_hidden=spec.pred_hidden, n_layers=1,
            enc_hidden=self.enc_cfg.d_model, joint_hidden=spec.joint_hidden,
            n_durations=0,
        )
        self.predictor = RnntPredictor(self.pred_cfg)
        self.joint = RnntJoint(self.pred_cfg)
        self.dcfg = TdtDecodeConfig(
            blank_id=spec.blank_id, durations=(), max_symbols_per_step=10,
            max_tokens=64, eou_id=spec.eou_token_id,
        )
        self.mel = MelFrontend(MelConfig(center=False, normalize=None))
        self._init_params(checkpoint_dir, rng_seed)
        self._step = jax.jit(self._chunk_step)

    def _init_params(self, checkpoint_dir: str | Path | None, rng_seed: int) -> None:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
        caches = init_caches(self.enc_cfg, 1)
        mel = jnp.zeros((1, self.enc_cfg.n_mels, self.mel_frames), jnp.float32)
        self.params = {
            "encoder": jax.jit(self.encoder.init)(k1, mel, caches),
            "predictor": jax.jit(self.predictor.init)(
                k2, jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 1, self.pred_cfg.pred_hidden)),
                jnp.zeros((1, 1, self.pred_cfg.pred_hidden)),
            ),
            "joint": jax.jit(self.joint.init)(
                k3, jnp.zeros((1, self.pred_cfg.enc_hidden)),
                jnp.zeros((1, self.pred_cfg.pred_hidden)),
            ),
        }
        base = Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.PARAKEET_EOU)
        loaded = False
        for part in ("encoder", "predictor", "joint"):
            f = base / f"{part}.npz"
            if f.exists():
                self.params[part] = load_params(f, self.params[part])
                loaded = True
        if not loaded:
            logger.warning("EOU: no checkpoints in %s — seeded random init", base)
        vocab_file = base / "vocab.json"
        self.tokenizer = (
            Tokenizer.from_json(vocab_file)
            if vocab_file.exists()
            else Tokenizer(_placeholder_vocab(self.spec.eou_token_id))
        )

    # ------------------------------------------------------------- jitted step

    def _chunk_step(self, params, window, last_sample, caches, dec_state):
        # mel fused into the chunk program: ONE device dispatch per chunk
        # (separate mel + encoder calls double the per-chunk host->device
        # round trips — the dominant cost for a remote/tunneled device)
        mel_chunk, _ = self.mel(window, last_samples=last_sample)
        mel_chunk = mel_chunk[:, :, : self.mel_frames]
        enc, new_caches = self.encoder.apply(params["encoder"], mel_chunk, caches)
        T = enc.shape[1]

        def predictor_step(tokens, h, c):
            return self.predictor.apply(params["predictor"], tokens, h, c)

        def joint_logits(f, g):
            return self.joint.apply(params["joint"], f, g)

        lengths = jnp.full((1,), T, jnp.int32)
        result = tdt_greedy_decode(
            self.dcfg, predictor_step, joint_logits, enc, lengths, dec_state
        )
        return result, new_caches

    # ------------------------------------------------------------------ public

    def make_state(self) -> _StreamState:
        return _StreamState(
            pending=np.zeros(0, np.float32),
            last_sample=0.0,
            consumed_samples=0,
            caches=init_caches(self.enc_cfg, 1),
            dec_state=make_initial_state(
                self.dcfg, self.pred_cfg.n_layers, self.pred_cfg.pred_hidden, 1
            ),
        )

    def process(self, audio: np.ndarray, state: _StreamState) -> list[EouPartialResult]:
        """Feed 16 kHz mono samples; returns partial results per processed chunk."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        state.pending = np.concatenate([state.pending, audio])
        need = self.chunk_samples + (MEL_WIN - MEL_HOP)  # 240-sample lookahead
        results = []
        while state.pending.size >= need:
            results.append(self._process_one(state))
        return results

    def finish(self, state: _StreamState) -> EouPartialResult:
        """Pad the tail with zeros and flush (reference finish(), :432-465)."""
        need = self.chunk_samples + (MEL_WIN - MEL_HOP)
        if state.pending.size > 0:  # flush ANY tail (even < one mel window)
            pad = (-state.pending.size) % need
            state.pending = np.concatenate(
                [state.pending, np.zeros(pad, np.float32)]
            )
            while state.pending.size >= need:
                self._process_one(state)
        return self._final_result(state)

    def _final_result(self, state) -> EouPartialResult:
        return EouPartialResult(
            text=self.tokenizer.decode(state.tokens),
            token_ids=list(state.tokens),
            timestamps_ms=list(state.timestamps_ms),
            is_final=True,
            eou_detected=False,
        )

    def _apply_encoder(self, params, mel_chunk, caches, prompt_ids):
        """MultiStreamMixin hook (prompt conditioning is a Nemotron-only
        feature; the EOU encoder ignores it)."""
        del prompt_ids
        return self.encoder.apply(params["encoder"], mel_chunk, caches)

    def _host_advance(self, state, raw_ids, frames,
                      eou_raw: bool) -> EouPartialResult:
        """Host-side chunk bookkeeping — shared VERBATIM between the
        single-stream (`_process_one`) and batched multi-stream
        (`MultiStreamMixin._serve_tick`) paths, so they cannot drift."""
        ids = [int(t) for t in raw_ids]
        ts_ms = compute_token_timestamps_ms(
            state.enc_frames_emitted, [int(f) for f in frames]
        )
        state.tokens.extend(ids)
        state.timestamps_ms.extend(ts_ms)
        state.enc_frames_emitted += self.mel_frames // 8
        # advance the stream
        state.last_sample = float(state.pending[self.chunk_samples - 1])
        state.pending = state.pending[self.chunk_samples :]
        state.consumed_samples += self.chunk_samples

        now_ms = state.consumed_samples / SAMPLE_RATE * 1000.0
        eou = eou_raw and (now_ms - state.last_eou_ms) >= EOU_DEBOUNCE_MS
        if eou:
            state.last_eou_ms = now_ms

        partial = EouPartialResult(
            text=self.tokenizer.decode(state.tokens),
            token_ids=ids,
            timestamps_ms=ts_ms,
            is_final=eou,
            eou_detected=eou,
        )
        if self.on_partial:
            self.on_partial(partial)
        if eou and self.on_eou:
            self.on_eou(partial)
        return partial

    def _process_one(self, state: _StreamState) -> EouPartialResult:
        window = state.pending[: self.chunk_samples + MEL_WIN - MEL_HOP]
        result, new_caches = self._step(
            self.params,
            jnp.asarray(window)[None, :],
            jnp.array([state.last_sample], jnp.float32),
            state.caches,
            state.dec_state,
        )

        # one device->host transfer for every host-consumed output
        tokens_h, counts_h, times_h, eou_h = jax.device_get(
            (result.tokens, result.counts, result.token_times, result.eou_detected)
        )
        count = int(counts_h[0])
        state.caches = new_caches
        # decode state carries across chunks; reset per-window time_jump
        state.dec_state = result.state._replace(
            time_jump=jnp.zeros_like(result.state.time_jump)
        )
        return self._host_advance(
            state, tokens_h[0][:count], times_h[0][:count], bool(eou_h[0])
        )
