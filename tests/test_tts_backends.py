"""StyleTTS2 + Supertonic3 backends + TTS->ASR round-trip harness."""

import numpy as np
import pytest

from fluidaudio_tpu.models.styletts2 import STYLETTS2_TEST
from fluidaudio_tpu.models.supertonic3 import SUPERTONIC3_TEST
from fluidaudio_tpu.tts.styletts2_manager import StyleTTS2Manager
from fluidaudio_tpu.tts.supertonic_manager import Supertonic3Manager, chunk_text


@pytest.fixture(scope="module")
def styletts2():
    return StyleTTS2Manager(STYLETTS2_TEST)


@pytest.fixture(scope="module")
def supertonic():
    return Supertonic3Manager(SUPERTONIC3_TEST)


def test_styletts2_default_style(styletts2):
    r = styletts2.synthesize("hello world")
    assert r.sample_rate == 24_000
    assert r.samples.size > 0 and np.all(np.isfinite(r.samples))


def test_styletts2_reference_style_changes_output(styletts2):
    rng = np.random.RandomState(0)
    ref = (rng.randn(24_000) * 0.1).astype(np.float32)
    a = styletts2.synthesize("same words", reference_audio=ref)
    b = styletts2.synthesize("same words")
    assert a.samples.size > 0
    assert a.samples.shape != b.samples.shape or not np.array_equal(a.samples, b.samples)


def test_supertonic_synthesize(supertonic):
    r = supertonic.synthesize("forty four kilohertz output", voice="sara")
    assert r.sample_rate == 44_100
    assert r.samples.size > 0 and np.abs(r.samples).max() <= 1.0
    with pytest.raises(KeyError):
        supertonic.synthesize("x", voice="nobody")


def test_supertonic_chunking():
    text = "One. " * 40
    chunks = chunk_text(text, 30)
    assert len(chunks) > 1
    assert all(len(c) <= 35 for c in chunks)
    assert " ".join(chunks).split() == text.split()


def test_roundtrip_harness(supertonic):
    """Round-trip runs end-to-end and reports a WER (random weights => high)."""
    from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels
    from fluidaudio_tpu.tts.roundtrip import tts_asr_roundtrip

    asr = AsrManager(
        AsrModels.load("test-tiny", allow_random_init=True),
        ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)),
    )
    result = tts_asr_roundtrip(supertonic, asr, "testing round trip", voice="sara")
    assert 0.0 <= result.wer <= 2.0
    assert result.audio_seconds > 0
    assert isinstance(result.transcript, str)
