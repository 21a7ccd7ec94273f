from fluidaudio_tpu.registry.model_names import FAMILIES, Repo, required_models
from fluidaudio_tpu.registry.registry import ModelRegistry, OfflineError, RegistryError
from fluidaudio_tpu.registry.download import DownloadUtils
from fluidaudio_tpu.registry.doctor import (
    check_repo,
    ensure_repo,
    readiness_report,
    repair_repo,
)

__all__ = [
    "FAMILIES",
    "Repo",
    "required_models",
    "check_repo",
    "ensure_repo",
    "readiness_report",
    "repair_repo",
    "ModelRegistry",
    "OfflineError",
    "RegistryError",
    "DownloadUtils",
]
