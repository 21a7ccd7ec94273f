"""Unified ASR: one FastConformer-RNNT checkpoint for batch AND streaming.

Behavioral parity: reference `Unified/UnifiedAsrManager.swift:5-49` (batch:
15 s full-attention windows merged via ChunkProcessor.mergeChunks) and
`Unified/StreamingUnifiedAsrManager.swift:16` (streaming: STATELESS re-encode
of [left | chunk | right] context windows — no conformer caches; the unified
checkpoint trades cache plumbing for re-compute).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fluidaudio_tpu.asr.config import ASRConfig
from fluidaudio_tpu.asr.manager import AsrManager
from fluidaudio_tpu.asr.sliding_window import (
    SlidingWindowAsrConfig,
    SlidingWindowAsrManager,
    SlidingWindowUpdate,
)
from fluidaudio_tpu.models.zoo import AsrModels


class UnifiedAsrManager:
    """Batch facade: identical to AsrManager but pinned to the unified spec."""

    def __init__(self, models: AsrModels | None = None, config: ASRConfig | None = None):
        self.models = models or AsrModels.load("v3", allow_random_init=True)
        self._inner = AsrManager(self.models, config)

    def transcribe(self, audio, sample_rate: int | None = None):
        return self._inner.transcribe(audio, sample_rate)


@dataclass(frozen=True)
class UnifiedStreamingConfig:
    chunk_seconds: float = 2.0
    left_context_seconds: float = 10.0
    right_context_seconds: float = 1.0


class StreamingUnifiedAsrManager:
    """Streaming facade: stateless [left|chunk|right] re-encode per step."""

    def __init__(
        self,
        models: AsrModels | None = None,
        config: UnifiedStreamingConfig | None = None,
    ):
        models = models or AsrModels.load("v3", allow_random_init=True)
        cfg = config or UnifiedStreamingConfig()
        self._sliding = SlidingWindowAsrManager(
            AsrManager(models),
            SlidingWindowAsrConfig(
                chunk_seconds=cfg.chunk_seconds,
                left_context_seconds=cfg.left_context_seconds,
                right_context_seconds=cfg.right_context_seconds,
            ),
        )

    def make_session(self):
        return self._sliding.make_session()

    def feed(self, samples: np.ndarray, session) -> list[SlidingWindowUpdate]:
        return self._sliding.feed(samples, session)

    def finish(self, session) -> SlidingWindowUpdate:
        return self._sliding.finish(session)

    def consume_token_timings(self, session):
        """Drain per-token timings (absolute seconds) confirmed since the last
        call; bounded buffer for hour-long streams. Reference
        `StreamingUnifiedAsrManager.swift:195-199` (issue #704)."""
        return self._sliding.consume_token_timings(session)

    def consume_word_timings(self, session):
        """Word-level spans since the last drain, for word→speaker
        attribution in streaming diarized ASR. Reference
        `StreamingUnifiedAsrManager.swift:201-209`."""
        return self._sliding.consume_word_timings(session)
