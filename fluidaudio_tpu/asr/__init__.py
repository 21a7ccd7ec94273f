from fluidaudio_tpu.asr.constants import ASRConstants
from fluidaudio_tpu.asr.config import (
    ASRConfig,
    ASRResult,
    TdtConfig,
    TokenTiming,
    WordTiming,
    build_word_timings,
)
from fluidaudio_tpu.asr.chunk import ChunkProcessor, TokenWindow
from fluidaudio_tpu.asr.tokenizer import Tokenizer

__all__ = [
    "ASRConstants",
    "ASRConfig",
    "ASRResult",
    "TdtConfig",
    "TokenTiming",
    "WordTiming",
    "build_word_timings",
    "ChunkProcessor",
    "TokenWindow",
    "Tokenizer",
    # managers import lazily (jax-heavy):
    # fluidaudio_tpu.asr.manager.AsrManager
    # fluidaudio_tpu.asr.streaming_eou.StreamingEouAsrManager
    # fluidaudio_tpu.asr.streaming_nemotron.StreamingNemotronAsrManager
    # fluidaudio_tpu.asr.multi_stream.MultiStreamEouManager
    # fluidaudio_tpu.asr.sliding_window.SlidingWindowAsrManager
    # fluidaudio_tpu.asr.unified.{UnifiedAsrManager,StreamingUnifiedAsrManager}
    # fluidaudio_tpu.asr.sensevoice_manager.SenseVoiceManager
    # fluidaudio_tpu.asr.paraformer_manager.ParaformerManager
    # fluidaudio_tpu.asr.cohere_manager.CoherePipeline
    # fluidaudio_tpu.asr.keyword_spotter.CtcKeywordSpotter
]
