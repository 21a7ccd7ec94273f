from fluidaudio_tpu.asr.constants import ASRConstants
from fluidaudio_tpu.asr.config import ASRConfig, ASRResult, TdtConfig, TokenTiming
from fluidaudio_tpu.asr.chunk import ChunkProcessor, TokenWindow
from fluidaudio_tpu.asr.tokenizer import Tokenizer

__all__ = [
    "ASRConstants",
    "ASRConfig",
    "ASRResult",
    "TdtConfig",
    "TokenTiming",
    "ChunkProcessor",
    "TokenWindow",
    "Tokenizer",
]
