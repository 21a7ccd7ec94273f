from fluidaudio_tpu.models.conformer import ConformerConfig, ConformerEncoder
from fluidaudio_tpu.models.predictor import PredictorConfig, RnntPredictor, RnntJoint

__all__ = [
    "ConformerConfig",
    "ConformerEncoder",
    "PredictorConfig",
    "RnntPredictor",
    "RnntJoint",
]
