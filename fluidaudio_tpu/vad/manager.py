"""VadManager: Silero VAD public API.

Behavioral parity: reference `VAD/VadManager.swift:14-30,162-330,352-376` —
4096-sample (256 ms) chunks with 64-sample carried context, repeat-last-sample
padding of the final partial chunk, LSTM h/c threaded sequentially; plus
`+SpeechSegmentation` (hysteresis machine) and `+Streaming` (state-in/state-out
events, deliberately not an async stream).

TPU re-design: the whole utterance's chunk loop is ONE `lax.scan` inside jit —
state stays in HBM and there is one device dispatch per utterance, not one per
256 ms (the reference pays a CoreML round-trip per chunk). Chunk counts are
bucketed (powers of two) so jit caches stay warm across file lengths.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.models.silero_vad import SileroVad, SileroVadConfig
from fluidaudio_tpu.registry import DownloadUtils, Repo
from fluidaudio_tpu.utils.checkpoint import load_params
from fluidaudio_tpu.utils.converter import AudioConverter
from fluidaudio_tpu.utils.logging import get_logger
from fluidaudio_tpu.vad.segmentation import detect_speech_sample_ranges, segments_from_ranges
from fluidaudio_tpu.vad.types import (
    CHUNK_SIZE,
    CONTEXT_SIZE,
    SAMPLE_RATE,
    STATE_SIZE,
    VadConfig,
    VadResult,
    VadSegment,
    VadSegmentationConfig,
    VadState,
    VadStreamEvent,
    VadStreamResult,
    VadStreamState,
)

logger = get_logger("vad")


class VadManager:
    def __init__(
        self,
        config: VadConfig | None = None,
        *,
        skip_model_loading: bool = False,
        checkpoint_dir: str | Path | None = None,
        rng_seed: int = 0,
    ):
        """`skip_model_loading=True` builds a logic-only manager for testing the
        segmentation/streaming machines (reference `VadManager(skipModelLoading:)`)."""
        self.config = config or VadConfig()
        self.model_cfg = SileroVadConfig()
        self.model = SileroVad(self.model_cfg)
        self.params: Any | None = None
        self._scan_cache: dict[int, Any] = {}
        self._step_jit = None
        if not skip_model_loading:
            self._load_params(checkpoint_dir, rng_seed)

    def _load_params(self, checkpoint_dir: str | Path | None, rng_seed: int) -> None:
        dummy = (
            jnp.zeros((1, self.model_cfg.model_input_size)),
            jnp.zeros((1, STATE_SIZE)),
            jnp.zeros((1, STATE_SIZE)),
        )
        self.params = jax.jit(self.model.init)(jax.random.PRNGKey(rng_seed), *dummy)
        ckpt = (
            Path(checkpoint_dir) if checkpoint_dir else DownloadUtils.repo_dir(Repo.VAD)
        ) / "silero_vad.npz"
        if ckpt.exists():
            self.params = load_params(ckpt, self.params)
        else:
            logger.warning("VAD: no checkpoint at %s — seeded random init", ckpt)

    # ----------------------------------------------------------------- device

    def _chunk_scan(self, n_chunks: int):
        """Jitted scan over [n_chunks, 4096] with carried (h, c, context)."""
        if n_chunks not in self._scan_cache:
            model = self.model

            def run(params, chunks, h, c, context):
                def step(carry, chunk):
                    h, c, ctx = carry
                    buf = jnp.concatenate([ctx, chunk], axis=-1)[None, :]
                    prob, h2, c2 = model.apply(params, buf, h[None], c[None])
                    new_ctx = chunk[-CONTEXT_SIZE:]
                    carry = (h2[0], c2[0], new_ctx)
                    return carry, (prob[0], *carry)

                _, (probs, hs, cs, ctxs) = jax.lax.scan(
                    step, (h, c, context), chunks
                )
                # per-step states so the caller can take the state AFTER the
                # last REAL chunk (bucket padding would otherwise advance the
                # LSTM through zero chunks and zero the carried context)
                return probs, hs, cs, ctxs

            self._scan_cache[n_chunks] = jax.jit(run)
        return self._scan_cache[n_chunks]

    def _single_step(self):
        if self._step_jit is None:
            model = self.model

            def run(params, chunk, h, c, context):
                buf = jnp.concatenate([context, chunk], axis=-1)[None, :]
                prob, h2, c2 = model.apply(params, buf, h[None], c[None])
                return prob[0], h2[0], c2[0], chunk[-CONTEXT_SIZE:]

            self._step_jit = jax.jit(run)
        return self._step_jit

    # ------------------------------------------------------------------- API

    @staticmethod
    def _pad_chunks(samples: np.ndarray) -> np.ndarray:
        """[n] -> [n_chunks, 4096], final partial chunk repeat-last padded."""
        n = samples.shape[0]
        n_chunks = max(1, -(-n // CHUNK_SIZE))
        out = np.empty((n_chunks, CHUNK_SIZE), np.float32)
        flat = out.reshape(-1)
        flat[:n] = samples
        if n < flat.size:
            flat[n:] = samples[-1] if n else 0.0
        return out

    def process(
        self, samples: np.ndarray, input_state: VadState | None = None
    ) -> list[VadResult]:
        """Sequential state-threaded probabilities for each 256 ms chunk."""
        assert self.params is not None, "model not loaded (skip_model_loading)"
        t0 = time.perf_counter()
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size == 0:
            return []
        state = input_state or VadState.initial()
        chunks = self._pad_chunks(samples)
        # bucket chunk count to limit recompiles
        n = chunks.shape[0]
        bucket = 1 << (n - 1).bit_length()
        padded = np.zeros((bucket, CHUNK_SIZE), np.float32)
        padded[:n] = chunks
        fn = self._chunk_scan(bucket)
        probs, hs, cs, ctxs = fn(
            self.params,
            jnp.asarray(padded),
            jnp.asarray(state.hidden_state),
            jnp.asarray(state.cell_state),
            jnp.asarray(state.context),
        )
        probs = np.asarray(probs)[:n]
        dt = (time.perf_counter() - t0) / max(1, n)

        # output state taken AFTER the last real chunk (not the pad tail)
        results = []
        final_state = VadState(
            np.asarray(hs[n - 1]), np.asarray(cs[n - 1]), np.asarray(ctxs[n - 1])
        )
        for i, p in enumerate(probs):
            st = final_state if i == n - 1 else state
            results.append(
                VadResult(
                    probability=float(p),
                    is_voice_active=float(p) >= self.config.default_threshold,
                    output_state=st,
                    processing_time=dt,
                )
            )
        return results

    def process_chunk(
        self, chunk: np.ndarray, input_state: VadState | None = None
    ) -> VadResult:
        assert self.params is not None
        t0 = time.perf_counter()
        state = input_state or VadState.initial()
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        if chunk.size < CHUNK_SIZE:
            pad_val = chunk[-1] if chunk.size else 0.0
            chunk = np.concatenate([chunk, np.full(CHUNK_SIZE - chunk.size, pad_val, np.float32)])
        chunk = chunk[:CHUNK_SIZE]
        fn = self._single_step()
        prob, h, c, ctx = fn(
            self.params,
            jnp.asarray(chunk),
            jnp.asarray(state.hidden_state),
            jnp.asarray(state.cell_state),
            jnp.asarray(state.context),
        )
        out_state = VadState(np.asarray(h), np.asarray(c), np.asarray(ctx))
        return VadResult(
            probability=float(prob),
            is_voice_active=float(prob) >= self.config.default_threshold,
            output_state=out_state,
            processing_time=time.perf_counter() - t0,
        )

    # ----------------------------------------------------------- segmentation

    def segment_speech(
        self,
        samples: np.ndarray,
        config: VadSegmentationConfig | None = None,
        probabilities: list[float] | None = None,
    ) -> list[VadSegment]:
        config = config or VadSegmentationConfig()
        if probabilities is None:
            probabilities = [r.probability for r in self.process(samples)]
        if not probabilities:
            return []
        threshold = self._entry_threshold(config)
        ranges = detect_speech_sample_ranges(
            probabilities, int(np.size(samples)), threshold, config
        )
        return segments_from_ranges(ranges)

    def segment_speech_audio(
        self, samples: np.ndarray, config: VadSegmentationConfig | None = None
    ) -> list[np.ndarray]:
        samples = np.asarray(samples, np.float32).reshape(-1)
        return [
            samples[seg.start_sample() : seg.end_sample()]
            for seg in self.segment_speech(samples, config)
        ]

    def _entry_threshold(self, config: VadSegmentationConfig) -> float:
        if config.negative_threshold is not None:
            return min(1.0, config.negative_threshold + config.negative_threshold_offset)
        return self.config.default_threshold

    # -------------------------------------------------------------- streaming

    def make_stream_state(self) -> VadStreamState:
        return VadStreamState.initial()

    def process_streaming_chunk(
        self,
        chunk: np.ndarray,
        state: VadStreamState,
        config: VadSegmentationConfig | None = None,
        return_seconds: bool = False,
        time_resolution: int = 1,
    ) -> VadStreamResult:
        config = config or VadSegmentationConfig()
        result = self.process_chunk(chunk, state.model_state)
        return self.streaming_state_machine(
            probability=result.probability,
            chunk_sample_count=int(np.size(chunk)),
            model_state=result.output_state,
            state=state,
            config=config,
            return_seconds=return_seconds,
            time_resolution=time_resolution,
        )

    def streaming_state_machine(
        self,
        probability: float,
        chunk_sample_count: int,
        model_state: VadState,
        state: VadStreamState,
        config: VadSegmentationConfig,
        return_seconds: bool = False,
        time_resolution: int = 1,
    ) -> VadStreamResult:
        next_state = VadStreamState(
            model_state=model_state,
            triggered=state.triggered,
            processed_samples=state.processed_samples + chunk_sample_count,
            temp_end_sample=state.temp_end_sample,
        )
        threshold = self._entry_threshold(config)
        negative = config.effective_negative_threshold(threshold)
        pad = int(config.speech_padding * SAMPLE_RATE)
        min_silence = int(config.min_silence_duration * SAMPLE_RATE)

        event: VadStreamEvent | None = None
        if probability >= threshold:
            next_state.temp_end_sample = None
            if not next_state.triggered:
                next_state.triggered = True
                start = max(0, next_state.processed_samples - pad - chunk_sample_count)
                event = self._make_event("speech_start", start, return_seconds, time_resolution)
        elif probability < negative and next_state.triggered:
            if next_state.temp_end_sample is None:
                next_state.temp_end_sample = next_state.processed_samples
            if next_state.processed_samples - next_state.temp_end_sample >= min_silence:
                end = max(0, next_state.temp_end_sample + pad - chunk_sample_count)
                next_state.triggered = False
                next_state.temp_end_sample = None
                event = self._make_event("speech_end", end, return_seconds, time_resolution)

        return VadStreamResult(state=next_state, event=event, probability=probability)

    @staticmethod
    def _make_event(
        kind: str, sample_index: int, return_seconds: bool, time_resolution: int
    ) -> VadStreamEvent:
        sample_index = max(0, sample_index)
        if return_seconds:
            factor = 10.0**time_resolution
            seconds = round(sample_index / SAMPLE_RATE * factor) / factor
            return VadStreamEvent(kind, sample_index, seconds)
        return VadStreamEvent(kind, sample_index, None)
