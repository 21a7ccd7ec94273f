from fluidaudio_tpu.diarizer.types import (
    DiarizerConfig,
    DiarizationResult,
    PipelineTimings,
    RawEmbedding,
    Speaker,
    TimedSpeakerSegment,
)
from fluidaudio_tpu.diarizer.speaker_manager import SpeakerManager
from fluidaudio_tpu.diarizer.manager import DiarizerManager

__all__ = [
    "DiarizerConfig",
    "DiarizationResult",
    "PipelineTimings",
    "RawEmbedding",
    "Speaker",
    "TimedSpeakerSegment",
    "SpeakerManager",
    "DiarizerManager",
]
