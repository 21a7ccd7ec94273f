"""TTS auxiliary scenario ports: AudioPostProcessor
(AudioPostProcessorTests.swift) and multilingual G2P language routing
(MultilingualG2PTests.swift:56-112)."""

import numpy as np
import pytest

from fluidaudio_tpu.tts.audio_post import AudioPostProcessor
from fluidaudio_tpu.tts.g2p import G2P_LANGUAGES, kokoro_voice_to_language

SR = 24_000


class TestAudioPostProcessor:
    def test_silence_stays_silent(self):
        p = AudioPostProcessor(SR)
        out = p.process(np.zeros(SR, np.float32))
        assert np.abs(out).max() == pytest.approx(0.0, abs=1e-7)

    def test_deess_reduces_high_frequency_peaks(self):
        p = AudioPostProcessor(SR)
        t = np.arange(SR, dtype=np.float32) / SR
        sibilant = np.sin(2 * np.pi * 8000.0 * t).astype(np.float32) * 0.8
        out = p.process(sibilant)
        mid = slice(SR // 4, SR // 2)  # away from the fades
        assert np.abs(out[mid]).max() < np.abs(sibilant[mid]).max()

    def test_preserves_low_frequency_content(self):
        p = AudioPostProcessor(SR)
        t = np.arange(SR, dtype=np.float32) / SR
        voice = np.sin(2 * np.pi * 200.0 * t).astype(np.float32) * 0.5
        out = p.process(voice)
        mid = slice(SR // 4, SR // 2)
        assert np.abs(out[mid]).max() == pytest.approx(0.5, rel=0.1)

    def test_no_nan_and_peak_limited(self):
        p = AudioPostProcessor(SR)
        rng = np.random.RandomState(0)
        loud = (rng.randn(SR) * 3.0).astype(np.float32)
        out = p.process(loud)
        assert np.all(np.isfinite(out))
        assert np.abs(out).max() <= 1.0 + 1e-6

    @pytest.mark.parametrize("n", [0, 1, 2, 5, 100])
    def test_short_inputs_do_not_crash(self, n):
        p = AudioPostProcessor(SR)
        out = p.process(np.ones(n, np.float32) * 0.1)
        assert out.shape == (n,)
        assert np.all(np.isfinite(out))

    def test_fades_applied_at_edges(self):
        p = AudioPostProcessor(SR, fade_seconds=0.01)
        out = p.process(np.ones(SR, np.float32) * 0.5)
        assert abs(out[0]) < 1e-6  # faded in from zero
        assert abs(out[-1]) < 1e-6  # faded out to zero


class TestKokoroVoiceLanguage:
    @pytest.mark.parametrize("voice,lang", [
        ("af_heart", "eng-us"), ("am_adam", "eng-us"),
        ("bf_alice", "eng-uk"), ("bm_daniel", "eng-uk"),
        ("ef_dora", "spa"), ("em_alex", "spa"),
        ("ff_siwis", "fra"),
        ("hf_alpha", "hin"), ("hm_omega", "hin"),
        ("if_sara", "ita"), ("im_nicola", "ita"),
        ("jf_alpha", "jpn"), ("jm_kumo", "jpn"),
        ("pf_dora", "por-bz"), ("pm_alex", "por-bz"),
        ("zf_xiaobei", "cmn"), ("zm_yunxi", "cmn"),
    ])
    def test_voice_to_language(self, voice, lang):
        assert kokoro_voice_to_language(voice) == lang

    @pytest.mark.parametrize("voice", ["xx_unknown", "", "a", "ax_odd"])
    def test_unknown_voice_returns_none(self, voice):
        assert kokoro_voice_to_language(voice) is None

    def test_all_mapped_codes_are_valid_charsiu_languages(self):
        for v in ("af_x", "bf_x", "ef_x", "ff_x", "hf_x", "if_x", "jf_x",
                  "pf_x", "zf_x"):
            assert kokoro_voice_to_language(v) in G2P_LANGUAGES
