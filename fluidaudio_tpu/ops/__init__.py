from fluidaudio_tpu.ops.mel import MelConfig, MelFrontend, log_mel_numpy

__all__ = ["MelConfig", "MelFrontend", "log_mel_numpy"]
