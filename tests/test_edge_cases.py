"""Edge cases across managers: empty/short inputs, degenerate shapes."""

import numpy as np
import pytest

from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
from fluidaudio_tpu.asr.manager import AsrManager
from fluidaudio_tpu.models.zoo import AsrModels


@pytest.fixture(scope="module")
def asr():
    return AsrManager(
        AsrModels.load("test-tiny", allow_random_init=True),
        ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)),
    )


def test_asr_empty_audio(asr):
    r = asr.transcribe(np.zeros(0, np.float32))
    assert r.text == "" and r.duration == 0.0


def test_asr_below_minimum(asr):
    r = asr.transcribe(np.zeros(1000, np.float32))  # < 0.1 s minimum
    assert r.text == ""


def test_asr_pure_silence(asr):
    r = asr.transcribe(np.zeros(16000, np.float32))
    assert isinstance(r.text, str)  # decodes without NaN/crash
    assert r.confidence >= 0.0


def test_vad_empty_and_silence():
    from fluidaudio_tpu.vad import VadManager

    vad = VadManager()
    assert vad.process(np.zeros(0, np.float32)) == []
    segs = vad.segment_speech(np.zeros(8000, np.float32))
    assert isinstance(segs, list)


def test_tokenizer_empty():
    from fluidaudio_tpu.asr.tokenizer import Tokenizer

    tok = Tokenizer({0: "▁a"})
    assert tok.decode([]) == ""
    # empty word becomes the bare boundary marker, unrepresentable here
    assert tok.encode_word("") is None
    assert tok.encode_word("a") == [0]


def test_chunk_merge_empty_sides():
    from fluidaudio_tpu.asr.chunk import ChunkProcessor, TokenWindow
    from fluidaudio_tpu.utils.audio_source import ArrayAudioSource

    cp = ChunkProcessor(ArrayAudioSource(np.zeros(1000, np.float32)))
    tokens = [TokenWindow(0, 1)]
    assert cp.merge_chunks([], tokens) == tokens
    assert cp.merge_chunks(tokens, []) == tokens
    assert cp.collapse_seam_word_duplicates([], {0: "▁a"}) == []


def test_der_empty_hypothesis():
    from fluidaudio_tpu.diarizer.metrics import compute_der
    from fluidaudio_tpu.diarizer.types import TimedSpeakerSegment

    ref = [TimedSpeakerSegment("A", 0, 5)]
    r = compute_der(ref, [], collar=0.0, duration=5.0)
    assert r.der == pytest.approx(1.0)  # everything missed
    r2 = compute_der([], [], duration=5.0)
    assert r2.der == 0.0


def test_wer_empty_strings():
    from fluidaudio_tpu.metrics import wer

    assert wer("", "").rate == 0.0
    assert wer("a b", "").errors == 2
    assert wer("", "a").insertions == 1
