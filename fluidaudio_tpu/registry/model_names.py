"""Model catalog: every model bundle the framework can load.

Behavioral parity: reference `ModelNames.swift:4-67,278-345,490-538` — a `Repo`
enum of ~30 HuggingFace repos with name/remote path/subpath/folder, plus
per-family required-model sets. The TPU rebuild stores JAX checkpoints
(orbax/npz) converted offline from the same upstream checkpoints the CoreML
bundles were produced from.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


@dataclass(frozen=True)
class RepoSpec:
    name: str  # HF repo id (upstream source of the weights)
    folder_name: str  # local cache folder
    sub_path: str | None = None  # subdirectory within the repo, if any


class Repo(Enum):
    # --- VAD ---
    VAD = RepoSpec("FluidInference/silero-vad-coreml", "silero-vad")
    # --- Parakeet TDT batch ASR ---
    PARAKEET_V2 = RepoSpec("FluidInference/parakeet-tdt-0.6b-v2-coreml", "parakeet-v2")
    PARAKEET_V3 = RepoSpec("FluidInference/parakeet-tdt-0.6b-v3-coreml", "parakeet-v3")
    PARAKEET_TDT_CTC_110M = RepoSpec(
        "FluidInference/parakeet-tdt_ctc-110m-coreml", "parakeet-tdt-ctc-110m"
    )
    PARAKEET_CTC_0_6B = RepoSpec("FluidInference/parakeet-ctc-0.6b-coreml", "parakeet-ctc-0.6b")
    PARAKEET_JA = RepoSpec("FluidInference/parakeet-tdt_ctc-0.6b-ja-coreml", "parakeet-ja")
    PARAKEET_EOU = RepoSpec("FluidInference/parakeet_realtime_eou_120m-v1-coreml", "parakeet-eou")
    PARAKEET_UNIFIED = RepoSpec("FluidInference/parakeet-unified-coreml", "parakeet-unified")
    # --- Nemotron streaming ---
    NEMOTRON_EN = RepoSpec("FluidInference/nemotron-speech-streaming-en-0.6b", "nemotron-en")
    NEMOTRON_MULTILINGUAL = RepoSpec(
        "FluidInference/nemotron-speech-streaming-multilingual", "nemotron-multilingual"
    )
    # --- Other ASR families ---
    SENSEVOICE = RepoSpec("FluidInference/sensevoice-small-coreml", "sensevoice")
    PARAFORMER = RepoSpec("FluidInference/paraformer-large-coreml", "paraformer")
    COHERE = RepoSpec("FluidInference/cohere-asr-coreml", "cohere-asr")
    # --- Diarization ---
    DIARIZER = RepoSpec("FluidInference/speaker-diarization-coreml", "diarizer")
    OFFLINE_DIARIZER = RepoSpec(
        "FluidInference/speaker-diarization-community-1-coreml", "offline-diarizer"
    )
    SORTFORMER = RepoSpec("FluidInference/diar-streaming-sortformer-4spk-v2", "sortformer")
    LS_EEND = RepoSpec("FluidInference/ls-eend-coreml", "ls-eend")
    # --- TTS ---
    KOKORO = RepoSpec("FluidInference/kokoro-82m-coreml", "kokoro")
    KOKORO_ANE = RepoSpec("FluidInference/kokoro-82m-ane", "kokoro-ane")
    KOKORO_ANE_ZH = RepoSpec("FluidInference/kokoro-82m-ane-zh", "kokoro-ane-zh")
    KOKORO_ANE_JA = RepoSpec("FluidInference/kokoro-82m-ane-ja", "kokoro-ane-ja")
    POCKET_TTS = RepoSpec("FluidInference/pocket-tts-coreml", "pocket-tts")
    STYLETTS2 = RepoSpec("FluidInference/styletts2-coreml", "styletts2")
    SUPERTONIC3 = RepoSpec("FluidInference/supertonic-3-coreml", "supertonic3")
    # --- G2P ---
    CHARSIU_G2P = RepoSpec("FluidInference/charsiu-g2p-coreml", "charsiu-g2p")

    @property
    def spec(self) -> RepoSpec:
        return self.value

    @property
    def folder_name(self) -> str:
        return self.value.folder_name


# Per-family required model graph names (the reference's `requiredModels` sets).
# For the TPU rebuild a "model" is a named checkpoint (params pytree) + config.
_REQUIRED: dict[Repo, tuple[str, ...]] = {
    Repo.VAD: ("silero_vad_unified_256ms",),
    Repo.PARAKEET_V2: ("preprocessor", "encoder", "decoder", "joint", "vocab"),
    Repo.PARAKEET_V3: ("preprocessor", "encoder", "decoder", "joint", "vocab"),
    Repo.PARAKEET_EOU: ("encoder", "decoder", "joint", "vocab"),
    Repo.DIARIZER: ("segmentation", "embedding"),
    Repo.OFFLINE_DIARIZER: ("segmentation", "fbank", "embedding", "plda_rho", "plda_parameters"),
    Repo.SORTFORMER: ("encoder",),
    Repo.KOKORO_ANE: (
        "albert",
        "post_albert",
        "alignment",
        "prosody",
        "noise",
        "vocoder",
        "tail_istft",
        "voices",
        "vocab",
    ),
    Repo.POCKET_TTS: (
        "cond_prefill",
        "flowlm_step",
        "flow_decoder_fused",
        "mimi_decoder",
        "tokenizer",
    ),
}


def required_models(repo: Repo) -> tuple[str, ...]:
    return _REQUIRED.get(repo, ())
