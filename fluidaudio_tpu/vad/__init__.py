from fluidaudio_tpu.vad.types import (
    VadConfig,
    VadResult,
    VadSegment,
    VadSegmentationConfig,
    VadStreamEvent,
    VadStreamResult,
    VadStreamState,
)
from fluidaudio_tpu.vad.manager import VadManager

__all__ = [
    "VadConfig",
    "VadResult",
    "VadSegment",
    "VadSegmentationConfig",
    "VadStreamEvent",
    "VadStreamResult",
    "VadStreamState",
    "VadManager",
]
