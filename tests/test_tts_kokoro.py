"""Kokoro TTS: G2P, duration expansion, synthesis pipeline smoke (tiny model)."""

import numpy as np
import pytest

from fluidaudio_tpu.models.kokoro import expand_durations
from fluidaudio_tpu.tts.g2p import EnglishG2P


def test_g2p_lexicon_and_fallback():
    g2p = EnglishG2P()
    assert g2p.word_to_phonemes("hello") == "həˈloʊ"  # lexicon hit
    oov = g2p.word_to_phonemes("brillig")  # rule fallback
    assert len(oov) > 0
    text = g2p.phonemize("Hello world!")
    assert "!" in text and "həˈloʊ" in text


def test_expand_durations():
    frame_tokens, total = expand_durations(np.array([2.0, 3.0, 1.0]), max_frames=10)
    assert total == 6
    assert list(frame_tokens[:6]) == [0, 0, 1, 1, 1, 2]
    assert all(frame_tokens[6:] == 2)  # tail padded with last token
    # shrink-to-fit when durations exceed the grid
    ft, total = expand_durations(np.array([50.0, 50.0]), max_frames=10)
    assert total <= 10


def test_synthesis_smoke(monkeypatch):
    import fluidaudio_tpu.models.kokoro as km
    import fluidaudio_tpu.tts.kokoro_manager as mgr_mod
    from dataclasses import replace

    # shrink the model for CPU tests
    monkeypatch.setattr(mgr_mod, "MAX_TOKENS", 64)
    monkeypatch.setattr(km, "MAX_TOKENS", 64)

    from fluidaudio_tpu.models.kokoro import KokoroConfig

    mgr = mgr_mod.KokoroManager.__new__(mgr_mod.KokoroManager)
    # patch config before __init__
    orig_init = mgr_mod.KokoroManager.__init__
    mgr_mod.KokoroConfig = lambda: KokoroConfig(d_model=64, n_albert_layers=1, max_frames=128)
    try:
        orig_init(mgr)
    finally:
        mgr_mod.KokoroConfig = KokoroConfig

    result = mgr.synthesize("hello world", voice="af_heart")
    assert result.sample_rate == 24_000
    assert result.samples.size > 0
    assert np.all(np.isfinite(result.samples))
    assert np.abs(result.samples).max() <= 1.0
    assert result.timings.text_seconds > 0 and result.timings.audio_seconds > 0
    # determinism
    r2 = mgr.synthesize("hello world", voice="af_heart")
    np.testing.assert_array_equal(result.samples, r2.samples)
    # unknown voice raises
    with pytest.raises(KeyError):
        mgr.synthesize("hi", voice="nope")
