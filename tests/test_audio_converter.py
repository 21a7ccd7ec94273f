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


class TestWavStreamReader:
    """Constant-memory WAV reader (`utils/audio_io.WavStreamReader`) —
    random-access equality with the whole-file reader across formats, and a
    bounded-peak-RSS proof for the streaming convert (reference
    `Shared/AudioConverter.swift:372` O(1)-memory contract)."""

    @pytest.mark.parametrize("dtype,channels", [
        ("int16", 1), ("int16", 2), ("float32", 1), ("float32", 3),
    ])
    def test_random_access_matches_whole_file(self, tmp_path, dtype, channels):
        from fluidaudio_tpu.utils.audio_io import WavStreamReader, read_wav_raw

        rng = np.random.RandomState(3)
        x = (rng.randn(44_100, channels).astype(np.float32) * 0.4).clip(-1, 1)
        if channels == 1:
            x = x[:, 0]
        path = tmp_path / "f.wav"
        write_wav(path, x, 44_100, dtype=dtype)
        whole, rate = read_wav_raw(path)
        with WavStreamReader(path) as r:
            assert r.sample_rate == rate == 44_100
            assert r.channels == (channels if channels > 1 else 1)
            assert r.n_frames == whole.shape[0]
            for start, count in [(0, 100), (1000, 4096), (44_000, 500),
                                 (44_100, 10), (0, r.n_frames)]:
                got = r.read_frames(start, count)
                want = whole[start : start + count]
                np.testing.assert_array_equal(got, want)
                assert got.dtype == whole.dtype

    def test_stream_convert_stereo_matches_one_shot(self, tmp_path):
        conv = AudioConverter()
        rng = np.random.RandomState(4)
        x = (rng.randn(44_100 * 3, 2).astype(np.float32) * 0.3).clip(-1, 1)
        src = tmp_path / "in.wav"
        write_wav(src, x, 44_100, dtype="float32")
        raw = tmp_path / "out.f32"
        total = conv.stream_convert_to_file(src, raw, chunk_seconds=0.7)
        streamed = np.fromfile(raw, np.float32)
        assert streamed.size == total
        one_shot = conv.resample_file(src)
        n = min(streamed.size, one_shot.size)
        np.testing.assert_allclose(streamed[:n], one_shot[:n], atol=1e-3)

    def test_stream_convert_bounded_peak_rss(self, tmp_path):
        """Converting a ~92 MB WAV must not raise the process high-water mark
        by anywhere near the payload size (O(chunk) memory, not O(file)).

        Runs in a SUBPROCESS so this process's prior allocations can't mask
        the measurement; the WAV itself is written streamingly."""
        import struct as _struct
        import subprocess
        import sys
        import textwrap

        wav = tmp_path / "big.wav"
        sr, ch, seconds = 48_000, 2, 480
        n = sr * seconds
        body_bytes = n * ch * 2
        with open(wav, "wb") as f:
            f.write(b"RIFF" + _struct.pack("<I", 36 + body_bytes) + b"WAVE")
            f.write(b"fmt " + _struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                           sr * ch * 2, ch * 2, 16))
            f.write(b"data" + _struct.pack("<I", body_bytes))
            rng = np.random.RandomState(5)
            for _ in range(seconds):  # 1 s at a time
                sec = (rng.randn(sr, ch) * 3000).astype("<i2")
                f.write(sec.tobytes())

        script = textwrap.dedent(f"""
            import os, sys
            def hwm_kb():
                with open("/proc/self/status") as f:
                    for line in f:
                        if line.startswith("VmHWM:"):
                            return int(line.split()[1])
                raise RuntimeError("no VmHWM")
            from fluidaudio_tpu.utils.converter import AudioConverter
            before = hwm_kb()
            total = AudioConverter().stream_convert_to_file(
                {str(wav)!r}, {str(tmp_path / 'out.f32')!r}, chunk_seconds=15.0)
            after = hwm_kb()
            print(before, after, total)
        """)
        out = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=540,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        )
        assert out.returncode == 0, out.stderr[-2000:]
        before, after, total = map(int, out.stdout.split()[-3:])
        assert total == pytest.approx(16_000 * seconds, abs=4)
        delta_mb = (after - before) / 1024.0
        # payload is ~92 MB; chunks are 15 s (stereo i16 read + f32 upcast +
        # mono mix + polyphase scratch ~= 20 MB transient). Bound at about a
        # third of the whole-file size: O(chunk), not O(file).
        assert delta_mb < 32, f"peak RSS grew {delta_mb:.1f} MB (not streaming?)"
