"""AudioConverter scenario parity suite.

Ports the reference's `Tests/FluidAudioTests/Shared/AudioConverterTests.swift`
coverage: already-correct passthrough, 44.1/48/8 kHz resampling, stereo and
3-6 channel mixdown, int16/int32 inputs, very short/long buffers, converter
reuse and format switching, bad-path errors, interpolation accuracy, WAV
round trip.
"""

from __future__ import annotations

import numpy as np
import pytest

from fluidaudio_tpu.utils.audio_io import read_audio, write_wav
from fluidaudio_tpu.utils.converter import AudioConverter, mix_to_mono, resample


def sine(seconds: float, freq: float, sr: int, channels: int = 1) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    mono = np.sin(2 * np.pi * freq * t).astype(np.float32)
    if channels == 1:
        return mono
    return np.stack([mono] * channels, axis=1)


@pytest.fixture()
def conv():
    return AudioConverter()


class TestResampleBuffer:
    def test_already_correct_format_passthrough(self, conv):
        x = sine(0.5, 440, 16_000)
        out = conv.resample_buffer(x, 16_000)
        np.testing.assert_array_equal(out, x)

    def test_44k_stereo_to_16k_mono(self, conv):
        x = sine(0.5, 440, 44_100, channels=2)
        out = conv.resample_buffer(x, 44_100)
        assert out.ndim == 1
        assert out.size == pytest.approx(8_000, rel=0.01)
        assert out.dtype == np.float32

    def test_48k_mono_to_16k(self, conv):
        out = conv.resample_buffer(sine(1.0, 440, 48_000), 48_000)
        assert out.size == pytest.approx(16_000, rel=0.01)

    def test_8k_upsample_to_16k(self, conv):
        out = conv.resample_buffer(sine(1.0, 440, 8_000), 8_000)
        assert out.size == pytest.approx(16_000, rel=0.01)

    def test_stereo_mixdown_averages(self, conv):
        left = np.full(160, 0.5, np.float32)
        right = np.full(160, -0.5, np.float32)
        out = conv.resample_buffer(np.stack([left, right], axis=1), 16_000)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    @pytest.mark.parametrize("channels", [3, 4, 5, 6, 8])
    def test_multichannel_mixdown(self, conv, channels):
        x = sine(0.25, 220, 48_000, channels=channels)
        out = conv.resample_buffer(x, 48_000)
        assert out.ndim == 1
        assert out.size == pytest.approx(4_000, rel=0.02)

    def test_very_short_buffer(self, conv):
        out = conv.resample_buffer(np.ones(3, np.float32), 44_100)
        assert out.ndim == 1  # no crash; tiny output

    def test_empty_buffer(self, conv):
        out = conv.resample_buffer(np.zeros(0, np.float32), 44_100)
        assert out.size == 0

    def test_very_long_buffer(self, conv):
        x = sine(30.0, 440, 44_100)
        out = conv.resample_buffer(x, 44_100)
        assert out.size == pytest.approx(480_000, rel=0.001)

    def test_int16_input(self, conv):
        x = (sine(0.25, 440, 16_000) * 32767).astype(np.int16)
        out = conv.resample_buffer(x, 16_000)
        assert out.dtype == np.float32

    def test_int32_input(self, conv):
        x = (sine(0.25, 440, 16_000) * 2**30).astype(np.int32)
        out = conv.resample_buffer(x, 16_000)
        assert out.dtype == np.float32

    def test_converter_reuse_and_format_switching(self, conv):
        for sr, ch in ((44_100, 2), (48_000, 1), (8_000, 1), (22_050, 3)):
            out = conv.resample_buffer(sine(0.2, 330, sr, channels=ch), sr)
            assert out.ndim == 1
            assert out.size == pytest.approx(0.2 * 16_000, rel=0.02)

    def test_interpolation_preserves_tone_frequency(self, conv):
        # A 1 kHz tone resampled 48k -> 16k must stay a 1 kHz tone.
        out = conv.resample_buffer(sine(1.0, 1000, 48_000), 48_000)
        spectrum = np.abs(np.fft.rfft(out[2048:-2048] * np.hanning(out.size - 4096)))
        peak_hz = float(np.argmax(spectrum)) * 16_000 / (out.size - 4096)
        assert peak_hz == pytest.approx(1000, abs=10)


class TestFiles:
    def test_resample_file_bad_path_raises(self, conv, tmp_path):
        with pytest.raises((FileNotFoundError, OSError)):
            conv.resample_file(tmp_path / "missing.wav")

    def test_wav_round_trip(self, conv, tmp_path):
        x = sine(0.5, 440, 44_100)
        path = tmp_path / "tone.wav"
        write_wav(path, x, 44_100)
        out = conv.resample_file(path)
        assert out.size == pytest.approx(8_000, rel=0.01)

    def test_stream_convert_matches_one_shot(self, conv, tmp_path):
        x = sine(3.0, 440, 44_100)
        src = tmp_path / "in.wav"
        write_wav(src, x, 44_100)
        raw = tmp_path / "out.f32"
        total = conv.stream_convert_to_file(src, raw, chunk_seconds=1.0)
        streamed = np.fromfile(raw, np.float32)
        assert streamed.size == total
        one_shot = conv.resample_file(src)
        assert abs(streamed.size - one_shot.size) <= 2
        n = min(streamed.size, one_shot.size)
        # identical apart from boundary-context rounding
        np.testing.assert_allclose(streamed[:n], one_shot[:n], atol=1e-3)


class TestHelpers:
    def test_mix_to_mono_shapes(self):
        assert mix_to_mono(np.zeros(10, np.float32)).shape == (10,)
        assert mix_to_mono(np.zeros((10, 2), np.float32)).shape == (10,)
        assert mix_to_mono(np.zeros((10, 1), np.float32)).shape == (10,)

    def test_resample_identity(self):
        x = sine(0.1, 440, 16_000)
        np.testing.assert_array_equal(resample(x, 16_000, 16_000), x)

    def test_resample_ratio_exactness(self):
        # 24k -> 16k is a clean 2:3; length must be exact.
        x = np.zeros(24_000, np.float32)
        assert resample(x, 24_000, 16_000).size == 16_000
