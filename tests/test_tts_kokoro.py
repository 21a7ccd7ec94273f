"""Kokoro TTS: G2P, duration expansion, synthesis pipeline smoke (tiny model)."""

import numpy as np
import pytest

from fluidaudio_tpu.models.kokoro import KokoroConfig, expand_durations
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
    # shrink-to-fit when durations exceed the grid
    ft, total = expand_durations(np.array([50.0, 50.0]), max_frames=10)
    assert total <= 10


def test_vocab_is_kokoro_table():
    from fluidaudio_tpu.tts.kokoro_manager import SYMBOLS, VOCAB

    assert len(SYMBOLS) == 178
    assert SYMBOLS[0] == "$" and VOCAB["$"] == 0
    assert VOCAB["ˈ"] > 0 and VOCAB["A"] > 0 and VOCAB[" "] > 0


def test_synthesis_smoke():
    import fluidaudio_tpu.tts.kokoro_manager as mgr_mod

    cfg = KokoroConfig(
        d_model=32,
        style_dim=16,
        n_layer=2,
        max_dur=8,
        albert_emb=16,
        albert_hidden=48,
        albert_heads=4,
        albert_inter=64,
        albert_layers=1,
        decoder_hidden=48,
        asr_res_ch=8,
        upsample_initial=32,
        max_frames=64,
    )
    mgr = mgr_mod.KokoroManager(config=cfg)
    result = mgr.synthesize("hi", voice="af_heart")
    assert result.sample_rate == 24_000
    assert result.samples.size > 0
    assert np.all(np.isfinite(result.samples))
    assert np.abs(result.samples).max() <= 1.0
    assert result.timings.text_seconds > 0 and result.timings.audio_seconds > 0
    # determinism
    r2 = mgr.synthesize("hi", voice="af_heart")
    np.testing.assert_array_equal(result.samples, r2.samples)
    # unknown voice raises
    with pytest.raises(KeyError):
        mgr.synthesize("hi", voice="nope")
