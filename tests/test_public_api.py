"""Public API surface smoke (reference CI tier: BasicInitializationTests /
CITests — every documented entry point imports and its config constructs).
No models are loaded; this is the import/config layer only."""

import importlib

import pytest

# (module, attribute) pairs documenting the public surface MIGRATION.md
# points users at. A rename that breaks any of these is a breaking change.
PUBLIC_API = [
    ("fluidaudio_tpu.models.zoo", "AsrModels"),
    ("fluidaudio_tpu.asr.manager", "AsrManager"),
    ("fluidaudio_tpu.asr.config", "ASRConfig"),
    ("fluidaudio_tpu.asr.config", "TdtConfig"),
    ("fluidaudio_tpu.asr.chunk", "ChunkProcessor"),
    ("fluidaudio_tpu.asr.sliding_window", "SlidingWindowAsrManager"),
    ("fluidaudio_tpu.asr.streaming_eou", "StreamingEouAsrManager"),
    ("fluidaudio_tpu.asr.streaming_nemotron", "StreamingNemotronAsrManager"),
    ("fluidaudio_tpu.asr.streaming_variants", "create_streaming_manager"),
    ("fluidaudio_tpu.asr.unified", "UnifiedAsrManager"),
    ("fluidaudio_tpu.asr.unified", "StreamingUnifiedAsrManager"),
    ("fluidaudio_tpu.asr.multi_stream", "MultiStreamEouManager"),
    ("fluidaudio_tpu.asr.arbitration", "arbitrate"),
    ("fluidaudio_tpu.asr.keyword_spotter", "CtcKeywordSpotter"),
    ("fluidaudio_tpu.asr.custom_vocab.context", "CustomVocabularyContext"),
    ("fluidaudio_tpu.asr.custom_vocab.rescorer", "VocabularyRescorer"),
    ("fluidaudio_tpu.asr.punctuation_commit", "PunctuationCommitLayer"),
    ("fluidaudio_tpu.asr.sensevoice_manager", "SenseVoiceManager"),
    ("fluidaudio_tpu.asr.paraformer_manager", "ParaformerManager"),
    ("fluidaudio_tpu.asr.cohere_manager", "CoherePipeline"),
    ("fluidaudio_tpu.vad.manager", "VadManager"),
    ("fluidaudio_tpu.vad.types", "VadConfig"),
    ("fluidaudio_tpu.vad.types", "VadSegmentationConfig"),
    ("fluidaudio_tpu.diarizer.manager", "DiarizerManager"),
    ("fluidaudio_tpu.diarizer.offline.manager", "OfflineDiarizerManager"),
    ("fluidaudio_tpu.diarizer.offline.types", "OfflineDiarizerConfig"),
    ("fluidaudio_tpu.diarizer.sortformer", "SortformerDiarizer"),
    ("fluidaudio_tpu.diarizer.lseend", "LSEENDDiarizer"),
    ("fluidaudio_tpu.diarizer.timeline", "DiarizerTimeline"),
    ("fluidaudio_tpu.diarizer.speaker_manager", "SpeakerManager"),
    ("fluidaudio_tpu.diarizer.speaker_id", "SpeakerVerifier"),
    ("fluidaudio_tpu.diarizer.metrics", "compute_der"),
    ("fluidaudio_tpu.tts.kokoro_manager", "KokoroManager"),
    ("fluidaudio_tpu.tts.pocket_manager", "PocketTtsManager"),
    ("fluidaudio_tpu.tts.styletts2_manager", "StyleTTS2Manager"),
    ("fluidaudio_tpu.tts.supertonic_manager", "Supertonic3Manager"),
    ("fluidaudio_tpu.tts.g2p", "EnglishG2P"),
    ("fluidaudio_tpu.tts.g2p", "MultilingualG2P"),
    ("fluidaudio_tpu.tts.mandarin_g2p", "MandarinG2P"),
    ("fluidaudio_tpu.tts.mandarin_g2p", "MandarinJiebaHmm"),
    ("fluidaudio_tpu.tts.ssml", "SSMLProcessor"),
    ("fluidaudio_tpu.tts.roundtrip", "tts_asr_roundtrip"),
    ("fluidaudio_tpu.itn", "TextNormalizer"),
    ("fluidaudio_tpu.registry", "ModelRegistry"),
    ("fluidaudio_tpu.registry", "DownloadUtils"),
    ("fluidaudio_tpu.registry", "Repo"),
    ("fluidaudio_tpu.utils.converter", "AudioConverter"),
    ("fluidaudio_tpu.utils.audio_stream", "AudioStream"),
    ("fluidaudio_tpu.utils.chunk_queue", "StreamingChunkQueue"),
    ("fluidaudio_tpu.utils.language", "TokenLanguageFilter"),
    ("fluidaudio_tpu.ops.tdt_decode", "tdt_greedy_decode"),
    ("fluidaudio_tpu.ops.mel", "MelFrontend"),
    ("fluidaudio_tpu.parallel.mesh", "make_mesh"),
    ("fluidaudio_tpu.metrics.wer", "wer"),
]


@pytest.mark.parametrize("module,attr", PUBLIC_API,
                         ids=[f"{m}.{a}" for m, a in PUBLIC_API])
def test_public_symbol_importable(module, attr):
    mod = importlib.import_module(module)
    assert hasattr(mod, attr), f"{module}.{attr} missing"


def test_default_configs_construct():
    from fluidaudio_tpu.asr.config import ASRConfig
    from fluidaudio_tpu.diarizer.offline.types import OfflineDiarizerConfig
    from fluidaudio_tpu.vad.types import VadConfig, VadSegmentationConfig

    ASRConfig()
    VadConfig()
    VadSegmentationConfig()
    OfflineDiarizerConfig().validate()


def test_version_string():
    import fluidaudio_tpu

    assert fluidaudio_tpu.__version__
