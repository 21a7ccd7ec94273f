from fluidaudio_tpu.train.transducer_loss import rnnt_loss, tdt_loss

__all__ = ["rnnt_loss", "tdt_loss"]
