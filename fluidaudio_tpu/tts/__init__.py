from fluidaudio_tpu.tts.kokoro_manager import KokoroManager, KokoroSynthesisResult

__all__ = ["KokoroManager", "KokoroSynthesisResult"]
