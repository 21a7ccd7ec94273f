from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig, SpeakerCountConstraints, total_chunks
from fluidaudio_tpu.diarizer.offline.manager import OfflineDiarizerManager

__all__ = ["OfflineDiarizerConfig", "OfflineDiarizerManager", "SpeakerCountConstraints", "total_chunks"]
