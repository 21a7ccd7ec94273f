"""ASR configuration + result types.

Behavioral parity: reference `Parakeet/AsrTypes.swift:5-101` (`ASRConfig`,
`ASRResult`) and `TDT/Decoder/TdtConfig.swift`. Note `parallel_chunk_batch`
replaces the reference's `parallelChunkConcurrency` worker pool: windows are
stacked on the batch axis of one pjit'd call instead of fanned out to cloned
managers (SURVEY.md §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TdtConfig:
    durations: tuple[int, ...] = (0, 1, 2, 3, 4)
    max_symbols_per_step: int = 10
    max_tokens_per_chunk: int = 512
    consecutive_blank_limit: int = 5
    include_token_duration: bool = True


@dataclass(frozen=True)
class ASRConfig:
    sample_rate: int = 16_000
    tdt: TdtConfig = field(default_factory=TdtConfig)
    encoder_hidden_size: int = 1024
    # windows decoded per device batch (reference default concurrency 4)
    parallel_chunk_batch: int = 4
    streaming_enabled: bool = True
    streaming_threshold: int = 480_000  # samples; above => disk-backed source
    mel_chunk_context: bool = True
    dual_decode_arbitration: bool = False
    prefer_silence_alignment: bool = False


@dataclass(frozen=True)
class TokenTiming:
    token: str
    token_id: int
    start_time: float
    end_time: float
    confidence: float


@dataclass
class ASRResult:
    text: str
    confidence: float
    duration: float
    processing_time: float
    token_timings: list[TokenTiming] = field(default_factory=list)
    # updated TDT decoder carry when the caller passed `decoder_state` /
    # single-window path (reference `AsrManager.transcribe(decoderState:)`)
    decoder_state: object = None

    @property
    def rtfx(self) -> float:
        return self.duration / self.processing_time if self.processing_time > 0 else 0.0
