from fluidaudio_tpu.itn.normalizer import TextNormalizer

__all__ = ["TextNormalizer"]
