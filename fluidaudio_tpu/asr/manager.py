"""AsrManager: public batch transcription API (Parakeet TDT family).

Behavioral parity: reference `TDT/AsrManager.swift:6,353-501` (transcribe from
array/URL with disk-backed auto-switch over `streamingThreshold`),
`AsrManager+Pipeline.swift:6-91` (mel -> encoder -> TDT decode), and
`ChunkProcessor.process` (long-form windows + merge). TPU re-design: the
reference's worker pool of 4 cloned managers becomes a window batch axis in
ONE jitted pipeline; per-token CoreML round-trips become a single
`lax.while_loop` (ops/tdt_decode.py).

Static-shape discipline: audio is padded into a small set of sample-width
buckets so jit caches stay warm; per-row valid lengths mask the padding.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fluidaudio_tpu.asr.chunk import (
    ChunkProcessor,
    TokenWindow,
    case_variant_canonical_ids,
    splice_safe_token_ids,
)
from fluidaudio_tpu.asr.config import ASRConfig, ASRResult, TokenTiming
from fluidaudio_tpu.asr.constants import ASRConstants
from fluidaudio_tpu.models.zoo import AsrModels
from fluidaudio_tpu.ops.tdt_decode import (
    TdtDecodeConfig,
    TdtDecodeState,
    make_initial_state,
    tdt_greedy_decode,
)
from fluidaudio_tpu.utils.audio_source import ArrayAudioSource, AudioSampleSource, make_audio_source
from fluidaudio_tpu.utils.converter import AudioConverter
from fluidaudio_tpu.utils.logging import get_logger
from fluidaudio_tpu.utils.timing import PerformanceMetrics, ProgressEmitter

logger = get_logger("asr")

# short-audio sample-width buckets (seconds: 1, 2, 4, 8, 15)
_BUCKETS = (16_000, 32_000, 64_000, 128_000, 240_000)


class AsrManager:
    def __init__(self, models: AsrModels, config: ASRConfig | None = None):
        self.models = models
        self.config = config or ASRConfig()
        self.converter = AudioConverter()
        self._pipeline_cache: dict[tuple[int, int], Any] = {}
        vocab = models.tokenizer.vocabulary
        self._splice_safe = splice_safe_token_ids(vocab)
        self._case_canon = case_variant_canonical_ids(vocab)
        # per-session progress stream for long transcriptions (reference
        # ProgressEmitter wiring, AsrManager.swift:101-107)
        self.progress = ProgressEmitter()

    # ------------------------------------------------------------- pipeline

    @property
    def _decode_cfg(self) -> TdtDecodeConfig:
        tdt = self.config.tdt
        return TdtDecodeConfig(
            blank_id=self.models.blank_id,
            durations=tdt.durations,
            max_symbols_per_step=tdt.max_symbols_per_step,
            max_tokens=tdt.max_tokens_per_chunk,
        )

    def build_pipeline(self, batch: int):
        """Raw (unjitted) pipeline fn(params, audio [B,W], lengths [B])."""
        models = self.models
        dcfg = self._decode_cfg
        pcfg = models.spec.predictor

        def pipeline(params, audio, lengths):
            mel, mel_len = models.mel(audio, lengths)
            enc_out, enc_len = models.encoder.apply(params["encoder"], mel, mel_len)

            def predictor_step(tokens, h, c):
                return models.predictor.apply(params["predictor"], tokens, h, c)

            def joint_logits(f, g):
                return models.joint.apply(params["joint"], f, g)

            state = make_initial_state(dcfg, pcfg.n_layers, pcfg.pred_hidden, batch)
            result = tdt_greedy_decode(
                dcfg, predictor_step, joint_logits, enc_out, enc_len, state
            )
            return result, enc_len

        return pipeline

    def _get_pipeline(self, batch: int, window_samples: int):
        key = (batch, window_samples)
        if key not in self._pipeline_cache:
            self._pipeline_cache[key] = jax.jit(self.build_pipeline(batch))
            logger.info("jit ASR pipeline batch=%d window=%d", batch, window_samples)
        return self._pipeline_cache[key]

    def warmup(self, batch: int | None = None, window_samples: int | None = None) -> None:
        """Pre-compile the long-form pipeline (reference ModelWarmup analog)."""
        b = batch or self.config.parallel_chunk_batch
        cp = ChunkProcessor(ArrayAudioSource(np.zeros(1, np.float32)))
        w = window_samples or cp.chunk_layout(self.config.mel_chunk_context).window_samples
        fn = self._get_pipeline(b, w)
        audio = jnp.zeros((b, w), jnp.float32)
        lengths = jnp.full((b,), w, jnp.int32)
        res, _ = fn(self.models.params, audio, lengths)
        jax.block_until_ready(res.tokens)

    # ------------------------------------------------------------ transcribe

    def transcribe(
        self, audio: np.ndarray | str | Path, sample_rate: int | None = None
    ) -> ASRResult:
        t_start = time.perf_counter()
        if isinstance(audio, (str, Path)):
            source = make_audio_source(
                audio, disk_backed_threshold=self.config.streaming_threshold
            )
        else:
            samples = np.asarray(audio, dtype=np.float32).reshape(-1)
            if sample_rate and sample_rate != self.config.sample_rate:
                samples = self.converter.resample_buffer(samples, sample_rate)
            source = ArrayAudioSource(samples)

        n = source.sample_count
        duration = n / self.config.sample_rate
        if n < ASRConstants.minimum_required_samples():
            return ASRResult("", 0.0, duration, time.perf_counter() - t_start)

        if n <= ASRConstants.MAX_MODEL_SAMPLES:
            tokens = self._transcribe_single(source)
        else:
            tokens = self._transcribe_chunked(source)

        tokens = ChunkProcessor(source).collapse_seam_word_duplicates(
            tokens, self.models.tokenizer.vocabulary
        )
        return self._assemble_result(tokens, duration, t_start)

    def _transcribe_single(self, source: AudioSampleSource) -> list[TokenWindow]:
        n = source.sample_count
        width = next((b for b in _BUCKETS if b >= n), ASRConstants.MAX_MODEL_SAMPLES)
        fn = self._get_pipeline(1, width)
        audio = jnp.asarray(source.copy_samples(0, width))[None, :]
        lengths = jnp.array([n], jnp.int32)
        result, _ = fn(self.models.params, audio, lengths)
        return self._extract_tokens(result, row=0, frame_offset=0)

    def _transcribe_chunked(self, source: AudioSampleSource) -> list[TokenWindow]:
        cp = ChunkProcessor(source)
        layout, windows = cp.plan_windows(
            mel_chunk_context=self.config.mel_chunk_context,
            model_version=self.models.spec.name,
            prefer_silence_alignment=self.config.prefer_silence_alignment,
        )
        B = self.config.parallel_chunk_batch
        W = layout.window_samples
        fn = self._get_pipeline(B, W)

        merged: list[TokenWindow] = []
        n_groups = -(-len(windows) // B)
        for i in range(0, len(windows), B):
            group = windows[i : i + B]
            audio = np.zeros((B, W), np.float32)
            lengths = np.zeros((B,), np.int32)
            for r, w in enumerate(group):
                audio[r, : w.read_count] = source.copy_samples(w.read_start, w.read_count)
                lengths[r] = w.read_count
            result, _ = fn(self.models.params, jnp.asarray(audio), jnp.asarray(lengths))
            for r, w in enumerate(group):
                window_tokens = self._extract_tokens(result, row=r, frame_offset=w.frame_offset)
                merged = cp.merge_chunks(
                    merged, window_tokens, self._splice_safe, self._case_canon
                )
            self.progress.emit((i // B + 1) / n_groups)
        return merged

    def _extract_tokens(self, result, row: int, frame_offset: int) -> list[TokenWindow]:
        count = int(result.counts[row])
        ids = np.asarray(result.tokens[row][:count])
        times = np.asarray(result.token_times[row][:count])
        confs = np.asarray(result.confidences[row][:count])
        return [
            TokenWindow(int(t), int(ts) + frame_offset, float(c))
            for t, ts, c in zip(ids, times, confs)
        ]

    def _assemble_result(
        self, tokens: list[TokenWindow], duration: float, t_start: float
    ) -> ASRResult:
        tok = self.models.tokenizer
        text = tok.decode([t.token for t in tokens])
        confidence = float(np.mean([t.confidence for t in tokens])) if tokens else 0.0
        spf = ASRConstants.SECONDS_PER_ENCODER_FRAME
        timings = [
            TokenTiming(
                token=tok.piece(t.token),
                token_id=t.token,
                start_time=t.timestamp * spf,
                end_time=(t.timestamp + 1) * spf,
                confidence=t.confidence,
            )
            for t in tokens
        ]
        return ASRResult(
            text=text,
            confidence=confidence,
            duration=duration,
            processing_time=time.perf_counter() - t_start,
            token_timings=timings,
        )
