from fluidaudio_tpu.registry.model_names import Repo, required_models
from fluidaudio_tpu.registry.registry import ModelRegistry, OfflineError, RegistryError
from fluidaudio_tpu.registry.download import DownloadUtils

__all__ = [
    "Repo",
    "required_models",
    "ModelRegistry",
    "OfflineError",
    "RegistryError",
    "DownloadUtils",
]
